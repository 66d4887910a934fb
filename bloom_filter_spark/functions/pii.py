"""PII detection / redaction — a mandatory pass in any training-data
pipeline (strip emails, phone numbers, IP addresses before training).

Everything is per-row JVM regex (``regexp_extract_all`` /
``regexp_replace`` inside whole-stage codegen): embarrassingly parallel,
ZERO shuffles, no Python on the hot path — the 100-TB cost is exactly one
scan.  Patterns are deliberately restricted to syntax Java regex and RE2
(the oracle engine) interpret identically (character classes, bounded
repetition, ``\\b`` word boundaries — no backrefs, no lookaround), so the
redaction is engine-reproducible byte-for-byte.

The reference has no text surface; this extends the curation family
(SURVEY.md §2.11) alongside decontamination and boilerplate detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ordered: emails first (their local/domain parts can contain digit runs an
# IP pattern might otherwise claim), then phones, then IPv4
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

REDACTIONS = [("email", EMAIL_RE, "<EMAIL>"),
              ("phone", PHONE_RE, "<PHONE>"),
              ("ipv4", IPV4_RE, "<IP>")]


def pii_scan(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII inventory + redacted text.

    → DataFrame(id_col, n_email, n_phone, n_ipv4, has_pii, redacted).
    Each category is counted on the text AS REDACTED SO FAR (same fixed
    order as the replacements), so ``n_<cat>`` equals exactly the number
    of ``<CAT>`` placeholders present in the final output — a digit run
    inside an email can't be double-counted as a phone/IP after the email
    is already gone (ADVICE r5).  Still one pure-codegen projection:
    the progressive texts are intermediate expressions, zero shuffles.
    """
    red = F.col(text_col)
    counts = []
    for name, pat, repl in REDACTIONS:
        counts.append(F.size(F.regexp_extract_all(red, F.lit(pat), 0))
                      .alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, repl)
    out = df.select(F.col(id_col), *counts, red.alias("redacted"))
    has = None
    for name, _, _ in REDACTIONS:
        c = F.col(f"n_{name}") > 0
        has = c if has is None else (has | c)
    return out.withColumn("has_pii", has).select(
        id_col, "n_email", "n_phone", "n_ipv4", "has_pii", "redacted")

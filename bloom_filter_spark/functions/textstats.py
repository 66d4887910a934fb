"""Text analysis for training-data curation — token counting, quality
scoring, document fingerprinting, language ID.

Everything except language-ID is pure built-in `pyspark.sql.functions`
(JVM-side, whole-stage codegen) so the hot path never crosses into Python;
language-ID scores character-trigram profiles in a vectorized pandas UDF
(the profiles are tiny and ship in the closure).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import StringType

# minimal stopword set shared with the SQL oracle (ASCII, lowercase corpus)
STOPWORDS = ["the", "a", "an", "of", "to", "in", "and", "is", "on", "for"]


def with_words(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("words", F.split(F.col(text_col), " "))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, n_distinct_words, n_chars_check) — whitespace
    tokenization; a BPE-ish regex variant is `token_count_bpe`."""
    w = with_words(df, text_col)
    return w.select(
        "doc_id",
        F.size("words").cast("long").alias("n_words"),
        F.size(F.array_distinct("words")).cast("long").alias("n_distinct_words"),
        F.length(text_col).cast("long").alias("n_chars_check"),
    )


def token_count_bpe(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sub-word-ish token count: split on word boundaries AND digit/letter
    transitions (a cheap BPE-like pre-tokenizer, GPT-2 pre-tokenize regex
    family) — still JVM-side regex."""
    pat = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
    return df.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
         .cast("long").alias("n_bpe_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features + bucket (rounded for oracle parity)."""
    w = with_words(df, text_col)
    n_words = F.size("words")
    stop_hits = F.size(F.array_intersect("words", F.array(*[F.lit(s) for s in STOPWORDS])))
    uniq_ratio = F.size(F.array_distinct("words")) / n_words
    mean_wlen = (F.length(text_col) - (n_words - 1)) / n_words
    score = (0.4 * uniq_ratio
             + 0.3 * F.least(F.lit(1.0), mean_wlen / F.lit(6.0))
             + 0.3 * F.least(F.lit(1.0), n_words / F.lit(64.0)))
    return w.select(
        "doc_id",
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        stop_hits.cast("long").alias("stopword_kinds"),
        F.round(score, 6).alias("quality"),
        F.when(score >= 0.8, "high").when(score >= 0.5, "mid").otherwise("low")
         .alias("quality_bucket"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical shingle-set fingerprint: md5 of the sorted distinct word
    set — identical docs (up to word order/duplication) collide by design."""
    w = with_words(df, text_col)
    return w.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct("words"))))
         .alias("fingerprint"),
    )


# tiny character-trigram profiles (top trigrams per language, public-knowledge
# frequency lists) — enough for a heuristic scorer over short texts
_PROFILES = {
    "en": ["the", "and", "ing", "ion", "ent", "her", "for", " th", "he ", "hat"],
    "de": ["der", "die", "und", "ein", "ich", "sch", "en ", "ch ", "cht", "das"],
    "es": ["de ", "la ", "que", "el ", "en ", "ión", "ado", "os ", "ent", "una"],
    "fr": ["es ", "de ", "le ", "ent", "la ", "que", "ion", "ait", "les", "une"],
}


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic n-gram language ID: argmax of per-language trigram-profile
    hit counts, 'und' (undetermined) when no profile scores ≥ 2 hits.
    Vectorized pandas UDF (Arrow batches; profile matching via str.count)."""
    profiles = _PROFILES

    @F.pandas_udf(StringType())
    def classify(texts: pd.Series) -> pd.Series:
        t = texts.fillna("").str.lower()
        scores = np.zeros((len(t), len(profiles)), np.int64)
        for j, (_, grams) in enumerate(profiles.items()):
            for g in grams:
                scores[:, j] += t.str.count(g, flags=0).to_numpy(np.int64)
        langs = list(profiles)
        best = scores.argmax(axis=1)
        out = np.array([langs[b] for b in best], dtype=object)
        out[scores.max(axis=1) < 2] = "und"
        return pd.Series(out)

    return df.select("doc_id", classify(F.col(text_col)).alias("lang_pred"))


def repetition_score(df: DataFrame, text_col: str = "text",
                     n: int = 3) -> DataFrame:
    """Intra-document repetition — the C4/Gopher-style quality signal:
    → (doc_id, n_grams_total, n_grams_distinct, repetition_ratio,
    top_gram_frac) where repetition_ratio = 1 − distinct/total (share of
    n-gram slots that repeat an earlier occurrence) and top_gram_frac is
    the modal n-gram's share.  Docs with fewer than ``n`` words are
    excluded (no n-gram positions exist).

    Scale shape: n-grams are generated JVM-side (dedup.gram_array — the
    one shared gram definition), ONE partial-agg groupBy(doc_id, gram)
    then a per-doc aggregate — word-count shuffle volume, nothing
    all-pairs, no UDF."""
    from .dedup import gram_array
    grams, k = gram_array(text_col, n)
    per_gram = (df.where(k >= 1)
                .select("doc_id", F.explode(grams).alias("g"))
                .groupBy("doc_id", "g").agg(F.count("*").alias("c")))
    return (per_gram.groupBy("doc_id")
            .agg(F.sum("c").alias("n_grams_total"),
                 F.count("*").alias("n_grams_distinct"),
                 F.max("c").alias("top_c"))
            .select("doc_id",
                    F.col("n_grams_total").cast("long").alias("n_grams_total"),
                    F.col("n_grams_distinct").cast("long")
                     .alias("n_grams_distinct"),
                    F.round(F.lit(1.0) - F.col("n_grams_distinct")
                            / F.col("n_grams_total"), 6)
                     .alias("repetition_ratio"),
                    F.round(F.col("top_c") / F.col("n_grams_total"), 6)
                     .alias("top_gram_frac")))


def tfidf_top_terms(df: DataFrame, text_col: str = "text",
                    k: int = 5) -> DataFrame:
    """Top-k characteristic terms per document by exact TF-IDF — the
    keyword/topic signal a curation pipeline uses for corpus composition
    audits.  score = tf × ln(N / df), tf the in-doc term count, df the
    number of DISTINCT docs containing the term, N the doc count;
    → (doc_id, term, tf, df, score[6dp], rank).

    Scale shape: two word-count-shaped groupBys (term counts per doc; doc
    frequency over distinct (doc, term)) — both map-side-combining
    equi-shuffles — then a window top-k per doc.  The df table joins back
    by term (AQE broadcasts it when small); N is one count.  All
    arithmetic is exact and engine-independent (ln + 6-dp round), so the
    DuckDB oracle reproduces scores bit-for-bit; ties rank by term ASC so
    both engines agree."""
    # NULL doc_ids are dropped up front: they are not documents (and
    # COUNT(DISTINCT doc_id) excludes them in every SQL engine — counting
    # them in N would shift every idf)
    df = df.where(F.col("doc_id").isNotNull())
    words = (df.select("doc_id",
                       F.explode(F.split(F.col(text_col), " ")).alias("term"))
             .where(F.col("term") != ""))
    tf = words.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = df.select("doc_id").distinct().count()
    scored = (tf.join(dfreq, "term")
              .withColumn("score", F.round(
                  F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")),
                  6)))
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
            .select("doc_id", "term", "tf", "df", "score",
                    F.col("rank").cast("long").alias("rank")))

"""Corpus profiling from mergeable sketch states.

The sketch-native answer to "how much do my sources overlap?": ONE grouped
mergeable build produces a KMV/theta state per group, and every pairwise
set estimate (intersection, union, Jaccard) composes from the G collected
states alone — no second corpus scan, no pairwise joins, no G² shuffles.
At 100 TB the corpus is touched once; the G × (k × 8 B) states are
driver-trivial for any realistic source count (10^4 sources × 32 KB =
300 MB), and the G²/2 pair loop is pure numpy over retained hashes.

The reference has no grouped or profiling surface; this extends the
mandated sketch set (SURVEY.md §2.7) the same way kmv_source_intersection
did, to the full matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sketches.kmv import KMVParams, KMVSketch


def source_overlap_matrix(df: DataFrame, group_col: str, col: str,
                          value_kind: str = "i32_array",
                          k: int = 4096) -> DataFrame:
    """Pairwise distinct-value overlap between ALL groups.

    → DataFrame(group_a, group_b, est_common double, est_union double,
    est_jaccard double) for every unordered pair (group_a < group_b),
    including zero-overlap pairs.  Estimates come from per-group KMV
    states (theta intersection / inclusion–exclusion union); relative
    error tracks the sketch's rse ≈ 1/√(k−1) on the union.
    """
    from ..operators import build_grouped

    sk = KMVSketch(KMVParams(k=k))
    grouped = build_grouped(df, sk, group_col, col, value_kind,
                            strategy="mapside")
    states = {r.group: KMVSketch.deserialize(bytes(r.state))[1]
              for r in grouped.collect()}
    names = sorted(states)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            common = float(sk.intersection_estimate(states[a], states[b]))
            union = (float(sk.estimate(states[a]))
                     + float(sk.estimate(states[b])) - common)
            rows.append((a, b, common, union,
                         common / union if union > 0 else 0.0))
    return df.sparkSession.createDataFrame(
        rows, "group_a string, group_b string, est_common double, "
              "est_union double, est_jaccard double")

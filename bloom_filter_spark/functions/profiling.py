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

from pyspark.sql import DataFrame, Window, functions as F

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


def token_distribution_drift(df: DataFrame, group_col: str, tokens_col: str,
                             group_a: str, group_b: str,
                             smoothing: float = 0.5) -> DataFrame:
    """Unigram-distribution drift between two groups: PSI + both KL
    directions — the standard corpus-mix monitoring check (did src_00's
    token distribution shift vs src_01's / vs last week's snapshot?).

    → one row (group_a, group_b, n_tokens_a, n_tokens_b, n_vocab_union,
    psi, kl_ab, kl_ba), the divergences rounded to 6 dp.  Additive
    smoothing over the UNION vocabulary keeps every term finite:
      p_t = (cnt_a(t) + s) / (N_a + s·V),  q_t analogously,
      PSI  = Σ (p_t − q_t)·ln(p_t/q_t)      (symmetric, ≥ 0)
      KL(a‖b) = Σ p_t·ln(p_t/q_t)
    All JVM-side: one scan filtered to the two groups (partition-prunable
    when the table is partitioned by the group column), one map-side-
    combined groupBy(token) producing conditional counts for both groups in
    the same pass (no self-join), totals broadcast back via a 1-row cross
    join, one scalar aggregation over the ~V token rows.  Nothing driver-
    side; shuffle volume is vocabulary-sized, independent of corpus size.
    """
    g = F.col(group_col)
    flat = (df.filter(g.isin([group_a, group_b]))
            .select(g.alias("g"), F.explode(tokens_col).alias("t")))
    counts = flat.groupBy("t").agg(
        F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("cb"))
    # totals (na, nb, v) as UNPARTITIONED window aggregates over the
    # vocab-sized counts table — NOT a separately-aggregated broadcast:
    # Spark plans a broadcast-totals subquery independently and does not
    # reuse the corpus exchange across it, so that shape scans + explodes
    # the corpus TWICE (measured: two consecutive full-corpus stages, sf1
    # drift 99.6 s → 46 s after this change).  The window costs one
    # Exchange of ~V rows into a single task — V is the union vocabulary,
    # bounded and ≪ corpus by definition, so this is the cheaper hop at
    # any corpus scale.
    w = Window.partitionBy()
    s = float(smoothing)
    joined = counts.select(
        "ca", "cb",
        F.sum("ca").over(w).alias("na"),
        F.sum("cb").over(w).alias("nb"),
        F.count("*").over(w).alias("v"))
    p = (F.col("ca") + F.lit(s)) / (F.col("na") + F.lit(s) * F.col("v"))
    q = (F.col("cb") + F.lit(s)) / (F.col("nb") + F.lit(s) * F.col("v"))
    return (joined
            .select(F.col("na"), F.col("nb"), F.col("v"),
                    ((p - q) * F.log(p / q)).alias("psi_t"),
                    (p * F.log(p / q)).alias("kla_t"),
                    (q * F.log(q / p)).alias("klb_t"))
            .groupBy("na", "nb", "v")
            .agg(F.round(F.sum("psi_t"), 6).alias("psi"),
                 F.round(F.sum("kla_t"), 6).alias("kl_ab"),
                 F.round(F.sum("klb_t"), 6).alias("kl_ba"))
            .select(F.lit(group_a).alias("group_a"),
                    F.lit(group_b).alias("group_b"),
                    F.col("na").cast("long").alias("n_tokens_a"),
                    F.col("nb").cast("long").alias("n_tokens_b"),
                    F.col("v").cast("long").alias("n_vocab_union"),
                    "psi", "kl_ab", "kl_ba"))


def quantile_drift_ks(df: DataFrame, group_col: str, value_col: str,
                      group_a: str, group_b: str, k: int = 200):
    """Kolmogorov–Smirnov drift between two groups' value distributions,
    SKETCH-FIRST: per-group mergeable KLL states (one grouped build — at
    100 TB the corpus is scanned once and only sketch states move), KS
    statistic = sup |cdf_a − cdf_b| evaluated on the union of the two
    sketches' retained items.  KLL's rank guarantee is UNIFORM over all
    ranks, so |ks_est − ks_exact| ≤ eps_a + eps_b at the sketch
    confidence.

    → (ks_est float, eps_bound float) plus the per-group states, for
    callers composing their own checks; the driver-gate query wraps this
    with an exact KS and a bound boolean.
    """
    from ..operators import build_grouped
    from ..sketches.kll import KLLParams, KLLSketch

    sk = KLLSketch(KLLParams(k=k))
    two = df.filter(F.col(group_col).isin([group_a, group_b]))
    grouped = build_grouped(two, sk, group_col, value_col, "f64",
                            strategy="mapside")
    states = {r.group: KLLSketch.deserialize(bytes(r.state))[1]
              for r in grouped.collect()}
    import numpy as np
    sa, sb = states[group_a], states[group_b]
    grid = np.union1d(np.concatenate([lv for lv in sa.levels if len(lv)]
                                     or [np.array([0.0])]),
                      np.concatenate([lv for lv in sb.levels if len(lv)]
                                     or [np.array([0.0])]))
    ks_est = float(np.abs(sk.rank(sa, grid) - sk.rank(sb, grid)).max())
    eps = 2.0 * sk.params.rank_error  # eps_a + eps_b, uniform rank bound
    return ks_est, eps


def exact_ks(df: DataFrame, group_col: str, value_col: str,
             group_a: str, group_b: str) -> DataFrame:
    """Exact KS statistic between two groups — integer-exact arithmetic:
    the sup is taken over INTEGER numerators |cum_a·N_b − cum_b·N_a| (no
    float accumulation), divided once at the end, so every engine computes
    the identical double.  One conditional-count groupBy(value) + one
    ordered cumulative window over the (small) distinct-value domain.

    → one row (group_a, group_b, n_a, n_b, ks_exact) — ks rounded 6 dp.
    """
    g = F.col(group_col)
    two = df.filter(g.isin([group_a, group_b])).select(
        g.alias("g"), F.col(value_col).alias("v"))
    cnt = two.groupBy("v").agg(
        F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("cb"))
    # totals ride the SAME single-partition ordered window the cumulative
    # sums already pay for (full-frame variant) — a broadcast-totals
    # subquery would be planned independently and re-scan the corpus
    # (the token_distribution_drift double-scan, same fix)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    wall = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                           Window.unboundedFollowing)
    cum = cnt.select(F.sum("ca").over(wall).alias("na"),
                     F.sum("cb").over(wall).alias("nb"),
                     F.sum("ca").over(w).alias("cuma"),
                     F.sum("cb").over(w).alias("cumb"))
    num = F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na"))
    return (cum.groupBy("na", "nb").agg(F.max(num).alias("maxnum"))
            .select(F.lit(group_a).alias("group_a"),
                    F.lit(group_b).alias("group_b"),
                    F.col("na").cast("long").alias("n_a"),
                    F.col("nb").cast("long").alias("n_b"),
                    F.round(F.col("maxnum")
                            / (F.col("na") * F.col("nb")), 6)
                     .alias("ks_exact")))

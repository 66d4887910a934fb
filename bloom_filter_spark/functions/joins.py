"""Sketch-accelerated join operators.

bloom_prefilter_join: the classic runtime-filter pattern as an explicit
operator — build a Bloom filter over the build side's join keys (tiny,
broadcast), drop probe-side rows that cannot match BEFORE the join shuffle.
At 100 TB this is the difference between shuffling the full fact table and
shuffling only the ~matching fraction; Spark's own
``spark.sql.optimizer.runtime.bloomFilter`` does this inside Catalyst for
some shapes — this operator makes it available for any plan, with OUR
sketch, and with zero false negatives guaranteed (the filter can only pass
non-matching rows, never drop matching ones, so join results are identical).

quantile_buckets / repartition_by_quantiles: equi-depth range partitioning
from a t-digest — one pass to sketch the distribution, then
``repartitionByRange`` on computed boundaries; the scalable answer to
sorting/range-bucketing skewed columns.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..operators import build_sketch, membership_udf
from ..sketches import BloomParams, BloomSketch, TDigestParams, TDigestSketch


def bloom_prefilter_join(probe_df: DataFrame, build_df: DataFrame,
                         probe_key: str, build_key: str | None = None,
                         how: str = "inner", p: float = 0.01,
                         expected_keys: int | None = None):
    """Join with a Bloom runtime pre-filter on the probe side.

    Returns (joined_df, stats) where stats reports the pre-filter
    selectivity.  Join semantics are identical to the unfiltered join for
    'inner' and 'left_semi' (zero false negatives ⇒ no matching row is ever
    dropped; false positives are removed by the join itself).  Outer joins
    are rejected: dropping probe rows before a 'left'/'full' join would
    silently lose rows that should appear null-extended.
    """
    allowed = {"inner", "left_semi", "leftsemi", "semi"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"bloom_prefilter_join preserves semantics only for inner/left_semi "
            f"joins, got how={how!r} (outer joins would drop null-extended rows)")
    build_key = build_key or probe_key
    spark = probe_df.sparkSession
    if expected_keys is None:
        expected_keys = build_df.select(build_key).distinct().count()
    sketch = BloomSketch(BloomParams(n=max(expected_keys, 64), p=p))
    dt = dict(probe_df.dtypes)[probe_key]
    value_kind = {"string": "str", "bigint": "i64"}.get(dt, "i32")
    blob, _ = build_sketch(build_df, sketch, build_key, value_kind)
    probe = membership_udf(spark, blob, "bloom", value_kind)
    filtered = probe_df.where(probe(F.col(probe_key)))
    joined = filtered.join(build_df, filtered[probe_key] == build_df[build_key], how)
    return joined, {"bloom_bits": sketch.params.m, "expected_keys": expected_keys}


def quantile_buckets(df: DataFrame, col: str, n_buckets: int,
                     compression: float = 300.0) -> list[float]:
    """Equi-depth bucket boundaries for `col` from a distributed t-digest —
    (n_buckets - 1) interior split points."""
    sketch = TDigestSketch(TDigestParams(compression=compression))
    blob, _ = build_sketch(df, sketch, col, "f64")
    _, state = TDigestSketch.deserialize(blob)
    qs = np.linspace(0, 1, n_buckets + 1)[1:-1]
    return [float(x) for x in sketch.quantiles(state, qs)]


def bucket_expr(col: str, bounds: list[float]):
    """Bucket id for ``col`` against monotone boundaries = number of
    boundaries exceeded (0 .. len(bounds)).  The F.lit(0) start keeps the
    no-boundary case (n_buckets=1) a Column instead of a Python int."""
    c = F.col(col).cast("double")
    return sum(((c > F.lit(b)).cast("int") for b in bounds), F.lit(0))


def repartition_by_quantiles(df: DataFrame, col: str, n_buckets: int,
                             bounds: list[float] | None = None) -> DataFrame:
    """Range-repartition on sketched equi-depth boundaries: balanced
    BUCKETS even for heavily skewed columns (each bucket receives ~1/n of
    the rows by construction).  Physical bucket→partition placement goes
    through repartitionByRange, whose boundary SAMPLING can occasionally
    merge two adjacent single-value buckets into one partition and leave
    another empty — the bucket histogram, not the partition row-count, is
    the operator's guarantee.  Pass precomputed ``bounds`` to skip the
    sketch pass (callers that already ran quantile_buckets)."""
    if bounds is None:
        bounds = quantile_buckets(df, col, n_buckets)
    # RANGE-partition the bucket id so bucket i lands in partition i — hash
    # partitioning would collide distinct buckets into shared partitions
    return (df.withColumn("__bucket", bucket_expr(col, bounds))
            .repartitionByRange(n_buckets, "__bucket")
            .drop("__bucket"))


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str, right_cols: list[str],
              tie_col: str | None = None,
              tolerance: int | None = None) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with the
    same ``key`` and right_ts ≤ left_ts (the feature-store / attribution
    staple Spark lacks as a built-in).

    Spark-first realization — union + running ``last(ignorenulls)`` window,
    NOT a per-key loop: both sides shuffle ONCE on ``key`` and sort by
    (ts, side); every left row then reads the most recent right payload in
    O(1) from the running frame.  At 100 TB this is a single exchange of the
    two projected sides — strictly cheaper than the naive
    inequality-join-then-rank (which explodes to all key-pairs before
    ranking).  Ties: a right row AT the left timestamp matches (≤); equal
    right timestamps within a key resolve to the largest ``tie_col``.

    ``right_cols`` must be non-null in ``right`` (the running-last trick
    cannot distinguish a null payload from no-match; matched-ness is the
    emitted ``<right_ts>_matched`` column).  ``tolerance``: max allowed
    left_ts − right_ts (same units as the ts columns); staler matches are
    null-extended, exactly like pandas merge_asof.

    Skew caveat: a single hot key serializes into one window task, and the
    running-last frame cannot be salted (order matters).  For a key whose
    row count breaks a task, pre-split BY TIME RANGE instead: process each
    time slice independently and seed slice N+1 with slice N's last right
    row per key — the slice boundary replays at most one row per key.
    """
    from pyspark.sql import Window

    for c in right_cols:
        if c == key:
            raise ValueError("right_cols must not include the join key")
    out_ts = f"{right_ts}_matched"
    reserved = {"_k", "_t", "_side", "_tie"}
    clashes = ((set(left.columns) & (set(right_cols) | {out_ts} | reserved))
               | (set(right.columns) & reserved))
    if clashes:
        raise ValueError(f"alias colliding columns before asof_join: "
                         f"{sorted(clashes)}")
    if tie_col is not None:
        # order ties in the column's NATIVE type — casting a string id to
        # long would null every tie and make the winner partition-order
        # dependent; the left side's null _tie must union-match that type
        tie = F.col(tie_col)
        tie_type = right.schema[tie_col].dataType
    else:
        tie = F.monotonically_increasing_id()
        from pyspark.sql.types import LongType
        tie_type = LongType()
    l = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"), F.lit(None).cast(tie_type).alias("_tie"),
        "*")
    r = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"), tie.alias("_tie"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias(f"_r_{out_ts}"))
    both = l.unionByName(r, allowMissingColumns=True)
    win = (Window.partitionBy("_k")
           .orderBy(F.asc("_t"), F.asc("_side"), F.asc_nulls_last("_tie"))
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = [F.last(f"_r_{c}", ignorenulls=True).over(win).alias(f"_m_{c}")
               for c in right_cols + [out_ts]]
    res = (both.select("*", *matched)
           .where(F.col("_side") == 1))
    if tolerance is not None:
        stale = (F.col("_t") - F.col(f"_m_{out_ts}")) > F.lit(tolerance)
        res = res.select(
            *left.columns,
            *[F.when(stale, None).otherwise(F.col(f"_m_{c}")).alias(c)
              for c in right_cols],
            F.when(stale, None).otherwise(F.col(f"_m_{out_ts}")).alias(out_ts))
    else:
        res = res.select(*left.columns,
                         *[F.col(f"_m_{c}").alias(c) for c in right_cols],
                         F.col(f"_m_{out_ts}").alias(out_ts))
    return res


def range_join(points: DataFrame, intervals: DataFrame, key: str,
               point_ts: str, start_ts: str, end_ts: str,
               bucket: int) -> DataFrame:
    """All (point, interval) pairs with the same ``key`` and
    start ≤ point_ts ≤ end — the range join Spark would otherwise plan as a
    broadcast-nested-loop / inequality join.

    Scale path: intervals explode to the fixed-width buckets they cover
    (``F.sequence`` — ceil(interval_len / bucket) + 1 rows per interval,
    bounded when interval lengths are), points hash to ONE bucket, and the
    candidates come from a plain equi-join on (key, bucket) that AQE can
    co-partition; the exact BETWEEN predicate filters bucket-edge misses.
    Pick ``bucket`` ≈ the typical interval length: each interval explodes
    to ~2 rows and the join never leaves equi-land.  Both inputs must carry
    ``key`` under the same name; all other columns must be disjoint
    (alias collisions away beforehand).  Timestamps are numeric (epoch
    units); a point on an interval boundary matches (inclusive both ends).
    """
    dup = (set(points.columns) & set(intervals.columns)) - {key}
    if dup:
        raise ValueError(f"alias colliding columns before range_join: {dup}")
    bi = int(bucket)

    def floordiv(col: str):
        # all-integer floor division: float `/` would round int64 epochs
        # beyond 2^53 (epoch nanos) and could mis-bucket edge points.
        # pmod ≥ 0 makes the numerator exactly divisible, so truncating
        # `div` equals floor for negatives too.
        return F.expr(f"(`{col}` - pmod(`{col}`, {bi})) div {bi}")

    iv = intervals.withColumn(
        "_bk", F.explode(F.sequence(floordiv(start_ts), floordiv(end_ts))))
    pt = points.withColumn("_bk", floordiv(point_ts))
    return (pt.join(iv, [key, "_bk"], "inner")
            .where(F.col(point_ts).between(F.col(start_ts), F.col(end_ts)))
            .drop("_bk"))

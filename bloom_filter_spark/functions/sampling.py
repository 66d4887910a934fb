"""Weighted sampling without replacement — training-data curation op.

Efraimidis & Spirakis 2006 (A-ES): draw a sample of k items without
replacement with inclusion probability proportional to weight by assigning
each item the key u_i^(1/w_i), u_i ~ U(0,1), and keeping the k largest keys.
Spark-first realization: the per-item key is a pure function of the row, so
the whole operator is one scan + global top-k — Catalyst plans the
``orderBy(desc).limit(k)`` as TakeOrderedAndProject (per-partition top-k,
k·P rows to the driver, NO data shuffle, no full sort), which is exactly the
distributed merge of per-partition weighted reservoirs.  A dedicated
mergeable reservoir sketch would duplicate what the optimizer already does.

Determinism: u_i derives from ``hash64_i64(id, seed)`` — the engine's
splitmix64 mixer (core/hashing.py) — so the sample is reproducible across
runs, partitionings and retries (a requirement for resumable curation
pipelines), and duplicate ids get identical keys (with ``dedup=True`` a
re-ingested copy can never displace other items).  We sort on log(u)/w, a monotone
transform of u^(1/w) that avoids pow() underflow for tiny u / huge w.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..core import hashing

_SCALE = 2.0 ** -53


def weighted_logkeys_np(ids: np.ndarray, weights: np.ndarray,
                        seed: int) -> np.ndarray:
    """log(u_i)/w_i per item (float64).  u_i ∈ (0,1] from the id hash;
    the +1 keeps u strictly positive so log is finite."""
    h = hashing.hash64_i64(np.asarray(ids, np.int64), seed)
    u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) * _SCALE
    w = np.asarray(weights, np.float64)
    if not (w > 0).all():  # rejects 0, negatives AND NaN (NaN > 0 is False)
        raise ValueError("A-ES weights must be strictly positive")
    return np.log(u) / w


def _long_id_guarded(id_col: str):
    """cast(id AS long) that FAILS LOUD when the cast nulls a non-null id
    (e.g. a string id column): the null-id drop downstream would otherwise
    turn caller misuse into a silently empty sample (code-review r5).
    Genuinely NULL source ids still pass through as NULL (dropped, by
    contract)."""
    idc = F.col(id_col)
    # try_cast: NULL on failure in ANSI and non-ANSI modes alike, so the
    # guard (not ANSI's generic CAST_INVALID_INPUT, which non-ANSI configs
    # never raise) is what fires — one clear message in every mode
    cast_id = idc.try_cast("long")
    return F.when(
        idc.isNotNull() & cast_id.isNull(),
        F.raise_error(F.lit(
            f"weighted_sample: id column '{id_col}' is not castable to "
            f"long — pass a numeric id column"))).otherwise(cast_id)


def weighted_sample_topk(df: DataFrame, id_col: str, weight_col: str,
                         k: int, seed: int = hashing.DEFAULT_SEED,
                         dedup: bool = False) -> DataFrame:
    """→ DataFrame(id, weight, logkey): the k items sampled without
    replacement ∝ weight.  One scan; TakeOrderedAndProject top-k.

    ``dedup``: the per-item key is idempotent (same id ⇒ same key), but a
    duplicated row still occupies a second top-k SLOT; pass True when ids
    may repeat — a pre-aggregation on (id, max weight) shuffles only the
    id/weight columns, never the payload, then the draw is exactly the
    distinct-id draw.
    """
    sel = (df.select(_long_id_guarded(id_col).alias("id"),
                     F.col(weight_col).cast("double").alias("weight"))
           # NB Spark orders NaN ABOVE all numerics, so `weight > 0` alone
           # would pass NaN weights straight into the top of the sample.
           # NULL ids are dropped in-plan: the deterministic key is a
           # function of the id, and Arrow would otherwise turn the null
           # into INT64_MIN garbage that could win a slot (code-review r5)
           .where(F.col("id").isNotNull())
           .where(F.col("weight") > 0).where(~F.isnan("weight")))
    if dedup:
        sel = sel.groupBy("id").agg(F.max("weight").alias("weight"))

    def add_keys(batches):
        import pyarrow as pa
        for b in batches:  # mapInArrow: engine convention, no pandas objects
            ids = b.column(0).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False)
            w = b.column(1).to_numpy(zero_copy_only=False)
            yield pa.RecordBatch.from_arrays(
                [b.column(0), b.column(1),
                 pa.array(weighted_logkeys_np(ids, w, seed), pa.float64())],
                ["id", "weight", "logkey"])

    keyed = sel.mapInArrow(add_keys, "id long, weight double, logkey double")
    return (keyed.orderBy(F.desc("logkey"), F.asc("id")).limit(k)
            .select(F.col("id").alias(id_col),
                    F.col("weight").alias(weight_col), "logkey"))


def weighted_sample_per_group(df: DataFrame, id_col: str, weight_col: str,
                              group_col: str, k: int,
                              seed: int = hashing.DEFAULT_SEED) -> DataFrame:
    """Stratified A-ES: an independent weighted k-sample per group (the
    per-source curation draw).  Same deterministic keys; rank-within-group
    replaces the global top-k, so the only exchange is the window's
    hash-partition on ``group_col`` over (id, group, weight) rows — payload
    columns never move, and no per-group state touches the driver."""
    sel = (df.select(_long_id_guarded(id_col).alias("id"),
                     # grp crosses the Arrow boundary as string (the
                     # build_grouped convention); non-string group columns
                     # come back stringified
                     F.col(group_col).cast("string").alias("grp"),
                     F.col(weight_col).cast("double").alias("weight"))
           .where(F.col("id").isNotNull())  # see weighted_sample_topk
           .where(F.col("weight") > 0).where(~F.isnan("weight")))

    def add_keys(batches):
        import pyarrow as pa
        for b in batches:  # mapInArrow: engine convention, no pandas objects
            ids = b.column(0).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False)
            w = b.column(2).to_numpy(zero_copy_only=False)
            yield pa.RecordBatch.from_arrays(
                [b.column(0), b.column(1), b.column(2),
                 pa.array(weighted_logkeys_np(ids, w, seed), pa.float64())],
                ["id", "grp", "weight", "logkey"])

    keyed = sel.mapInArrow(
        add_keys, "id long, grp string, weight double, logkey double")
    win = Window.partitionBy("grp").orderBy(F.desc("logkey"), F.asc("id"))
    return (keyed.withColumn("rn", F.row_number().over(win))
            .where(F.col("rn") <= k).drop("rn")
            .select(F.col("id").alias(id_col),
                    F.col("grp").alias(group_col),
                    F.col("weight").alias(weight_col), "logkey"))


def _hash_u32(id_col: str, salt: str):
    """The ONE deterministic id→[0, 2^32) hash shared by hash_split and
    stratified_hash_sample (and mirrored literally in their SQL oracles):
    first 8 hex chars of md5(id ‖ salt).  A change here must ship in
    lock-step with the oracles or splits and samples silently diverge."""
    return (F.conv(F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8),
        16, 10).cast("long"))


def hash_split(df: DataFrame, id_col: str, weights: dict[str, float],
               salt: str = "") -> DataFrame:
    """Deterministic dataset splitting (train/val/test): append a ``split``
    column assigned by ``md5(id || salt)`` against cumulative weight
    boundaries over [0, 2^32).

    Why hash-based and not ``rand()``: the assignment is a pure function of
    the row — reproducible across runs, partitionings, retries and engines,
    join-free at any scale (no split table to keep), and STABLE under
    ingestion: adding documents never reassigns existing ids, so a model
    trained yesterday was not trained on today's test set.  Changing
    ``salt`` re-rolls the whole assignment.  Proportions are exact in
    expectation (each id is an independent draw from the hash's uniform)."""
    import math
    # `not (w >= 0)` (not `w < 0`) so NaN weights are rejected here rather
    # than crashing opaquely at the boundary arithmetic below
    if not weights or any(not (math.isfinite(w) and w >= 0)
                          for w in weights.values()):
        raise ValueError(
            "weights must be finite and non-negative with at least one entry")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = _hash_u32(id_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        bound = int(acc * (1 << 32))
        cond = h < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    # a NULL id has no stable hash — its split is NULL, never a silent
    # assignment to the catch-all (last) split, which would concentrate
    # every null-id row in the held-out set
    split = F.when(F.col(id_col).isNull(),
                   F.lit(None).cast("string")).otherwise(split)
    return df.withColumn("split", split)


def stratified_hash_sample(df: DataFrame, id_col: str, stratum_col: str,
                           rates: dict[str, float], default_rate: float = 1.0,
                           salt: str = "") -> DataFrame:
    """Deterministic per-stratum downsampling (language/source balancing):
    keep a row iff ``md5(id || salt)`` falls under its stratum's rate
    threshold over [0, 2^32).

    The keep decision is a pure function of (id, salt) — reproducible
    across runs/engines, join-free, and CONSISTENT across strata: the same
    id is compared against the same point of the hash space everywhere, so
    raising a rate strictly grows the kept set (nested samples — rerunning
    curation with a higher budget never drops previously kept docs).
    Strata not in ``rates`` use ``default_rate``.  Null-id rows are DROPPED
    (a null id has no stable hash, so no keep decision is reproducible for
    it — unlike hash_split, which labels rather than filters and can carry
    them as NULL)."""
    import math
    for name, r in rates.items():
        if not (math.isfinite(r) and 0.0 <= r <= 1.0):
            raise ValueError(f"rate for {name!r} must be in [0, 1], got {r}")
    if not (math.isfinite(default_rate) and 0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    h = _hash_u32(id_col, salt)
    thr = F.lit(int(default_rate * (1 << 32)))
    for name, r in rates.items():
        thr = F.when(F.col(stratum_col) == name,
                     F.lit(int(r * (1 << 32)))).otherwise(thr)
    return df.where(F.col(id_col).isNotNull() & (h < thr))


def pack_offsets(df: DataFrame, id_col: str, len_col: str,
                 budget: int, num_partitions: int | None = None) -> DataFrame:
    """Concat-then-chunk packing layout (the LLM pretraining staple):
    documents concatenated in ``id_col`` order and split into fixed
    ``budget``-token context windows; → (id, len, start_offset, bin_id,
    bin_offset) where start_offset is the doc's position in the global
    token stream, bin_id = start_offset div budget and bin_offset its
    position inside that window (docs may straddle windows — exactly the
    pretraining layout).

    Spark-first DISTRIBUTED PREFIX SUM — a single global-order window would
    serialize into one task, so instead: repartitionByRange on the id
    (partition p holds the p-th id range, ``id_col`` values must be
    UNIQUE — duplicate ids would take arbitrary relative offsets),
    sortWithinPartitions + one vectorized mapInArrow pass computing each
    partition's running sum (NO second exchange — a Window partitioned on
    the partition id would re-cluster the whole data by hash), and
    per-partition base offsets from a P-row aggregate folded on the driver
    and BROADCAST-joined back.  The cumsum stage is localCheckpoint-pinned
    so the totals job and the result read ONE evaluation — range-boundary
    sampling re-running on nondeterministic input could otherwise move a
    row between partitions AFTER its base was folded.  Total shuffle = one
    range exchange of (id, len) plus P tiny rows."""
    import pyarrow  # noqa: F401 — imported for the worker closure
    bi = int(budget)
    if bi <= 0:
        raise ValueError("budget must be positive")
    sel = (df.where(F.col(id_col).isNotNull()
                    & F.col(len_col).isNotNull() & (F.col(len_col) >= 0))
           .select(F.col(id_col).alias("_id"),
                   F.col(len_col).cast("long").alias("_len")))
    if num_partitions is not None:
        sel = sel.repartitionByRange(num_partitions, "_id")
    else:
        sel = sel.repartitionByRange("_id")
    ordered = sel.sortWithinPartitions("_id")

    def cum_fn(batches):
        import numpy as np
        import pyarrow as pa
        from pyspark import TaskContext
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        run = 0
        for b in batches:
            lens = b.column(1).to_numpy(zero_copy_only=False)
            cum = run + np.cumsum(lens, dtype=np.int64)
            run = int(cum[-1]) if len(lens) else run
            yield pa.RecordBatch.from_arrays(
                [b.column(0), b.column(1),
                 pa.array(cum - lens, pa.int64()),
                 pa.array(np.full(len(lens), pid, np.int32), pa.int32())],
                ["_id", "_len", "_ls", "_p"])

    id_type = dict(sel.dtypes)["_id"]
    local = ordered.mapInArrow(
        cum_fn, f"_id {id_type}, _len long, _ls long, _p int")
    # pin ONE evaluation of the range partitioning + cumsum: the totals
    # job and the returned plan must see identical partition assignments
    local = local.localCheckpoint(eager=False)
    totals = {r._p: r.t for r in
              local.groupBy("_p").agg(F.sum("_len").alias("t")).collect()}
    base_rows, acc = [], 0
    for p in sorted(totals):
        base_rows.append((p, acc))
        acc += totals[p]
    spark = df.sparkSession
    bases = spark.createDataFrame(base_rows or [(0, 0)],
                                  "_p int, _base long")
    start = (F.col("_base") + F.col("_ls")).alias("start_offset")
    return (local.join(F.broadcast(bases), "_p")
            .select(F.col("_id").alias(id_col),
                    F.col("_len").alias(len_col), start)
            .withColumn("bin_id", F.expr(f"start_offset div {bi}"))
            .withColumn("bin_offset", F.expr(f"start_offset % {bi}")))


def epoch_shuffle(df: DataFrame, id_col: str, epoch: int, salt: str = "",
                  num_partitions: int | None = None) -> DataFrame:
    """Deterministic per-epoch corpus shuffle (the pretraining data-order
    op): every row gets ``shuffle_key = md5(id ‖ 'e<epoch>' ‖ salt)`` and
    the output is globally ordered by it — a different, reproducible
    permutation per epoch.

    Spark-first scale shape: ``repartitionByRange(shuffle_key)`` + a local
    sort per partition — a range Exchange and P independent sorts, NEVER a
    global sort (reading partitions in index order yields the total
    order).  The key is a pure function of (id, epoch, salt): resuming a
    crashed epoch reproduces the identical order, and engines agree on it
    (the oracle recomputes the same md5 arithmetic).  NULL ids have no
    stable key and are dropped (a shuffle position for an unidentifiable
    row is undefined)."""
    key = _hash_u32(id_col, f"e{int(epoch)}{salt}")
    out = (df.where(F.col(id_col).isNotNull())
           .withColumn("shuffle_key", key))
    parts = num_partitions or out.sparkSession.sparkContext.defaultParallelism
    return (out.repartitionByRange(parts, "shuffle_key", id_col)
            .sortWithinPartitions("shuffle_key", id_col))


def mixture_sample(df: DataFrame, id_col: str, source_col: str,
                   epochs: dict[str, float], default_epochs: float = 1.0,
                   salt: str = "") -> DataFrame:
    """Data-mixture construction with per-source epoch factors (the 'wiki
    ×2.5, web ×0.3' pretraining recipe): each row is emitted
    ``floor(e)`` times plus one more iff its hash falls under frac(e) —
    deterministic oversampling AND undersampling in one pure-function op.

    → input columns + ``copy`` (1-based repeat index).  Join-free and
    shuffle-free (the explode is row-local); expected multiplicity of
    every doc is exactly its source's e; reproducible across runs,
    retries, partitionings and engines (the oracle recomputes the same
    md5 arithmetic + generate_series).  NULL ids can't take the
    fractional draw (no stable hash), so they are dropped — never
    silently over- or under-mixed."""
    import math
    for name, e in epochs.items():
        if not (math.isfinite(e) and e >= 0):
            raise ValueError(f"epochs for {name!r} must be finite ≥ 0")
    if not (math.isfinite(default_epochs) and default_epochs >= 0):
        raise ValueError("default_epochs must be finite ≥ 0")
    # factors ride a broadcast-joined (source, full, thr) table instead of
    # an O(G)-deep chained CASE WHEN (r6 verdict: 10^5 sources would blow
    # the Catalyst expression tree).  Same IEEE-double → integer arithmetic
    # as the former literals (floor / frac·2^32 truncation), computed once
    # driver-side per source, so the emitted copy set is identical.
    def _full_thr(e: float) -> tuple[int, int]:
        fl = math.floor(float(e))
        return int(fl), int((float(e) - fl) * float(1 << 32))

    h = _hash_u32(id_col, salt + "mix")
    d_full, d_thr = _full_thr(default_epochs)
    spark = df.sparkSession
    if epochs:
        factors = spark.createDataFrame(
            [(str(name), *_full_thr(e)) for name, e in sorted(epochs.items())],
            "_mx_src string, _mx_full long, _mx_thr long")
        joined = df.join(
            F.broadcast(factors),
            F.col(source_col).cast("string") == F.col("_mx_src"), "left")
    else:
        joined = (df.withColumn("_mx_src", F.lit(None).cast("string"))
                  .withColumn("_mx_full", F.lit(None).cast("long"))
                  .withColumn("_mx_thr", F.lit(None).cast("long")))
    n_copies = (F.coalesce(F.col("_mx_full"), F.lit(d_full)).cast("long")
                + (h < F.coalesce(F.col("_mx_thr"), F.lit(d_thr))).cast("long"))
    return (joined.where(F.col(id_col).isNotNull())
            .withColumn("copy", F.explode(
                F.when(n_copies >= 1,
                       F.sequence(F.lit(1).cast("long"), n_copies))
                .otherwise(F.array().cast("array<long>"))))
            .drop("_mx_src", "_mx_full", "_mx_thr"))


def temperature_mixture(df: DataFrame, id_col: str, source_col: str,
                        alpha: float = 0.5, target_total: int | None = None,
                        salt: str = "") -> DataFrame:
    """Temperature-based source rebalancing — the multilingual-pretraining
    recipe (sample source i with probability ∝ n_i^α, α<1 upweights tail
    sources): derives per-source epoch factors e_i = T·q_i/n_i with
    q_i = n_i^α / Σ_j n_j^α from the corpus itself, then applies the same
    deterministic floor+hash-gated copy arithmetic as ``mixture_sample``.
    T defaults to the corpus size (output expected count ≈ input count).

    Scale shape: ONE G-row groupBy count (G = bounded source domain — the
    same driver-side composition rule as the KMV overlap matrix), then a
    broadcast-joined factor lookup + row-local explode.  One corpus scan
    per stage, two end-to-end: the eager count here, then the output's own
    scan when the caller runs it.

    Cross-engine determinism: factors are quantized ONCE to integer
    micro-epochs e6 = ⌊1e6·T·n^α / (S·n) + 0.5⌋; full copies (e6 div 1e6)
    and the u32 hash threshold ((e6 mod 1e6)·2^32 div 1e6) are then pure
    integer arithmetic carried on a tiny broadcast (source, full, thr)
    table, so the emitted copy set is exactly reproducible by any engine
    that reaches the same e6 (the oracle recomputes it with the identical
    expression tree; Σ is an ascending-source sequential fold on both
    sides; n^0.5 = IEEE sqrt is exactly reproducible — non-half-integer α
    inherits libm pow and is documented as engine-dependent in the last
    ulp).

    → input columns + ``copy`` (1-based).  NULL ids are dropped (no
    stable hash — same rule as mixture_sample)."""
    import math
    if not (math.isfinite(alpha) and alpha > 0):
        raise ValueError("alpha must be finite > 0")
    base = df.where(F.col(id_col).isNotNull())
    counts = {r[0]: r[1] for r in
              base.groupBy(source_col).count().collect()}
    # NULL sources have no temperature weight — they fall through every
    # per-source branch to the 0-copy default (dropped), like NULL ids
    counts.pop(None, None)
    if not counts:
        return base.withColumn("copy", F.lit(1).cast("long")).limit(0)
    total = sum(counts.values())
    T = float(total if target_total is None else target_total)
    if T < 0 or not math.isfinite(T):
        raise ValueError("target_total must be finite >= 0")
    # ascending-source sequential fold — mirrored by the oracle's
    # list_sum(list(... ORDER BY source)) so S is bit-identical
    S = 0.0
    weights = {}
    for s in sorted(counts):
        # α=0.5 routes through IEEE sqrt (exactly reproducible in any
        # engine); other α use libm pow, engine-dependent in the last ulp
        weights[s] = (math.sqrt(counts[s]) if alpha == 0.5
                      else float(counts[s]) ** alpha)
        S += weights[s]
    e6 = {s: int(math.floor(1000000.0 * T * weights[s]
                            / (S * counts[s]) + 0.5))
          for s in counts}
    h = _hash_u32(id_col, salt + "tmix")
    # factors ride a broadcast-joined (source, full, thr) table instead of
    # an O(G)-deep chained CASE WHEN (r6 verdict #3: a 10^5-source corpus
    # would blow the Catalyst expression tree; the join keeps the plan flat
    # at any G).  The integer arithmetic per source is unchanged, so the
    # emitted copy multiset — and the oracle's recomputation — is identical.
    # NULL / unseen sources fall to the 0-copy default via the left join.
    spark = df.sparkSession
    factors = spark.createDataFrame(
        [(str(s), e6[s] // 1000000, (e6[s] % 1000000) * 4294967296 // 1000000)
         for s in sorted(counts)],
        "_tm_src string, _tm_full long, _tm_thr long")
    joined = base.join(
        F.broadcast(factors),
        F.col(source_col).cast("string") == F.col("_tm_src"), "left")
    n_copies = (F.coalesce(F.col("_tm_full"), F.lit(0)).cast("long")
                + (h < F.coalesce(F.col("_tm_thr"), F.lit(0))).cast("long"))
    return (joined.withColumn("copy", F.explode(
        F.when(n_copies >= 1,
               F.sequence(F.lit(1).cast("long"), n_copies))
        .otherwise(F.array().cast("array<long>"))))
        .drop("_tm_src", "_tm_full", "_tm_thr"))


def trim_by_group_rank(df: DataFrame, col: str, group_col: str,
                       lower_q: float = 0.0, upper_q: float = 1.0,
                       keep_rank: bool = False) -> DataFrame:
    """Per-group rank-based outlier trimming (the length/quality-score
    filter of a curation pipeline): keep rows whose ``percent_rank`` of
    ``col`` WITHIN their group lies in [lower_q, upper_q].

    Rank-based (not value-interpolated) on purpose: percent_rank is exact
    rational arithmetic — (rank−1)/(n−1), ties share a rank — so the kept
    set is deterministic, identical across engines, and insensitive to
    tie order; a quantile-value cut would inherit each engine's
    interpolation rules.  One hash Exchange on the group + per-group sort;
    NULL values are dropped (they have no rank).  ``keep_rank`` appends
    the 6-dp ``pct_rank`` column."""
    if not (0.0 <= lower_q <= upper_q <= 1.0):
        raise ValueError("require 0 <= lower_q <= upper_q <= 1")
    w = Window.partitionBy(group_col).orderBy(F.col(col).asc())
    out = (df.where(F.col(col).isNotNull())
           .withColumn("pct_rank", F.round(F.percent_rank().over(w), 6))
           .where((F.col("pct_rank") >= lower_q)
                  & (F.col("pct_rank") <= upper_q)))
    return out if keep_rank else out.drop("pct_rank")

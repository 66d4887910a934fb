"""Distributed sketch build — the partial phase of the mergeable UDAF.

Design (SURVEY.md §3.1): the build is expressed so that the *data* never
shuffles — ``mapInArrow`` folds every input partition into one sketch state
locally, emitting a single (partition_id, n_items, state) row per partition.
Only those P small state rows move through the merge tree
(operators/merge.py).  At 100 TB the scan stays embarrassingly parallel and
the shuffle volume is P × |state|, independent of input size.

``mapInArrow`` (not mapInPandas) is load-bearing: for array<int32> columns
the pandas conversion materializes one ndarray object PER ROW, and measured
on this host the allocation storm makes the exchange anti-scale (4.8 s at
local[4] → 36.7 s at local[32] for a pass-through).  The Arrow path reads
the list column's flat values buffer zero-copy — one numpy view per batch.

``build_sketch_preagg`` is the second scale lever: for draws from a modest
key domain (tokens from a ~50k vocab), a JVM-side partial aggregation
(explode → groupBy(key).count(), Tungsten hash agg with map-side combine)
collapses the stream BEFORE it ever reaches Python — the Python workers see
only (distinct key, weight) pairs (~50k/partition instead of millions), and
weighted updates preserve exactness for Bloom/HLL (weight-insensitive) and
CMS/t-digest (weight-additive).  For high-cardinality keys the direct path
wins (no shuffle at all); the choice is a flag, not a heuristic.

Grouped builds ("one sketch per source") are the skew-prone case — the
fixture's zipfian source weights put 45% of rows in one group.  The north
rule's salted repartition is implemented as a two-phase aggregation:
``groupBy(source, salt)`` partials (caps any single task at group/n_salts)
→ ``groupBy(source)`` merge of the tiny states.  Cuckoo filters, which have
no sound union-merge (SURVEY.md §2.3), use the single-writer grouped path
with no salting.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F

from ..core.hashing import StrBuf, arrow_strbuf
from ..sketches.base import sketch_for_kind
from .merge import PARTIAL_SCHEMA, merge_partials_tree


def _flatten_arrays(col: pd.Series) -> np.ndarray:
    """Series of array<int32> cells → one flat int32 vector (no row loop)."""
    arrs = [a for a in col.to_numpy() if a is not None and len(a)]
    if not arrs:
        return np.empty(0, np.int32)
    return np.concatenate(arrs).astype(np.int32, copy=False)


def _update(sketch, state, values, value_kind: str) -> int:
    if len(values) == 0:
        return 0
    if value_kind == "i32":
        sketch.update_i32(state, np.asarray(values, np.int32))
    elif value_kind == "i64":
        if hasattr(sketch, "update_i64"):
            sketch.update_i64(state, np.asarray(values, np.int64))
        elif hasattr(sketch, "update"):  # quantile sketches take floats
            sketch.update(state, np.asarray(values, np.float64))
        else:
            raise ValueError(f"{sketch.kind} does not support i64 values")
    elif value_kind == "f64":
        sketch.update(state, np.asarray(values, np.float64))
    elif value_kind == "str":
        if isinstance(values, StrBuf):  # zero-copy Arrow path, nulls dropped
            sketch.update_str(state, values)
        else:
            sketch.update_str(state, [v for v in values if v is not None])
    else:
        raise ValueError(f"unknown value_kind {value_kind}")
    return len(values)


def _arrow_values(col, value_kind: str):
    """Arrow column → flat numpy values + n (zero-copy where possible)."""
    import pyarrow as pa
    if value_kind == "i32_array":
        # list<int32>: drop nulls, then read the flat values buffer directly
        if col.null_count:
            col = col.drop_null()
        flat = col.flatten()
        return flat.to_numpy(zero_copy_only=False).astype(np.int32, copy=False)
    if col.null_count:
        col = col.drop_null()
    if value_kind == "str":
        # zero-copy offsets/values view — Python string objects never
        # materialize on the build hot path (VERDICT r4 #3); kernels hash
        # the UTF-8 bytes straight from the Arrow buffers
        buf = arrow_strbuf(col)
        return buf if buf is not None else col.to_pylist()
    return col.to_numpy(zero_copy_only=False)


def _bound_state_volume(sel: DataFrame, sketch) -> DataFrame:
    """Auto-coalesce the fold input when P × |state| would flood the merge.

    For WIDE states (a 600k-capacity counting bloom serializes to ~33 MB)
    the per-partition partial — not the input rows — dominates the merge:
    64 partials × 33 MB is 2.1 GB through the tree.  Coalesce (no shuffle)
    to keep total state volume around the merge router's byte budget —
    but NEVER below the cluster's concurrent task slots, so the scan phase
    keeps its CPU parallelism no matter how large one state is (a 1000-
    executor fleet building a GB-scale filter still scans with every
    core; only partition counts in EXCESS of the slots are trimmed).
    Narrow sketches (bloom/HLL/CMS ≤ a few MB) are never touched.
    Measured: 600k-doc cbloom changelog fold 93 s → 14 s at sf0.1."""
    from .merge import AUTO_TREE_THRESHOLD_BYTES, state_size_estimate
    sz = state_size_estimate(sketch)
    p = sel.rdd.getNumPartitions()
    if p * sz > AUTO_TREE_THRESHOLD_BYTES:
        sc = sel.sparkSession.sparkContext
        task_cpus = int(sc.getConf().get("spark.task.cpus", "1") or "1")
        slots = max(1, sc.defaultParallelism // task_cpus)
        # ONE monotone rule: partitions beyond the cluster's task slots are
        # pure merge overhead — extra waves of the same scan CPU, each
        # shipping another |state| — so once the state volume exceeds the
        # budget, trim to the slots (full CPU parallelism, minimum merge
        # bytes).  Never below the slots: scan parallelism is sacred.
        if slots < p:
            return sel.coalesce(slots)
    return sel


# Sketches whose FINAL MERGED STATE is a pure function of the input multiset
# (bit-OR / register-max / counter-sum merges): any re-partitioning of the
# same rows folds to bit-identical blobs, so these may take the native-scan
# fast path below without changing any declared query's output.  Order- or
# partition-sensitive states (KLL compaction, t-digest centroids, MG,
# reservoir, DDSketch collapse) must keep the plan-defined partitioning.
_PARTITION_DETERMINISTIC_KINDS = frozenset(
    ("bloom", "blocked_bloom", "hll", "cms", "countsketch"))


def _attr_through_projects(df: DataFrame, cols: list[str]):
    """→ (physical column names, local parquet files) when ``df``'s optimized
    plan is nothing but attribute-preserving Projects over ONE v1 parquet
    relation — the shape where a Python task can read the files directly.
    Any other node (Filter, Limit, Join, generated columns, non-parquet or
    remote storage) returns None and the caller keeps the JVM scan path."""
    try:
        node = df._jdf.queryExecution().optimizedPlan()
        names = list(cols)
        while True:
            cls = node.getClass().getSimpleName()
            if cls == "Project":
                exprs = node.projectList()
                mapped = {}
                for i in range(exprs.size()):
                    e = exprs.apply(i)
                    ecls = e.getClass().getSimpleName()
                    if ecls == "AttributeReference":
                        mapped[e.name()] = e.name()
                    elif ecls == "Alias":
                        ch = e.child()
                        if ch.getClass().getSimpleName() == "AttributeReference":
                            mapped[e.name()] = ch.name()
                if any(n not in mapped for n in names):
                    return None
                names = [mapped[n] for n in names]
                node = node.child()
            elif cls == "LogicalRelation":
                rel = node.relation()
                if rel.getClass().getSimpleName() != "HadoopFsRelation":
                    return None
                fmt = rel.fileFormat().getClass().getSimpleName()
                if "Parquet" not in fmt:
                    return None
                files = []
                for f in df.inputFiles():
                    if f.startswith("file:"):
                        f = f[5:]
                        while f.startswith("//"):
                            f = f[1:]
                    elif "://" in f:
                        return None  # remote storage — JVM scan path
                    files.append(f)
                if not files:
                    return None
                return names, files
            else:
                return None
    except Exception:
        return None


def _parquet_splits(spark, files: list[str], need_cols: list[str],
                    need_types: dict[str, str] | None = None,
                    state_bytes: int | None = None):
    """Driver-side metadata pass: verify every file physically carries the
    needed top-level columns (+ optional Arrow type constraints), then pack
    all (file, row-group) units into ≈4× the cluster's task slots of
    round-robin splits.  Returns list[dict[file, [rg,...]]] or None."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from .merge import AUTO_TREE_THRESHOLD_BYTES
    units: list[tuple[str, int]] = []
    for f in files:
        if not os.path.exists(f):
            return None
        try:
            pf = pq.ParquetFile(f)
        except Exception:
            return None
        schema = pf.schema_arrow
        for c in need_cols:
            idx = schema.get_field_index(c)
            if idx < 0:
                return None
            if need_types and c in need_types:
                t = schema.field(idx).type
                want = need_types[c]
                if want == "string" and not (pa.types.is_string(t)
                                             or pa.types.is_large_string(t)):
                    return None
        units.extend((f, rg) for rg in range(pf.metadata.num_row_groups))
    if not units:
        return None
    sc = spark.sparkContext
    task_cpus = int(sc.getConf().get("spark.task.cpus", "1") or "1")
    slots = max(1, sc.defaultParallelism // task_cpus)
    # 4× slots balances stragglers when partials are near-free to ship;
    # past ~256 KB per state the merge collect pays state-volume, not scan
    # balance, so wide states emit exactly one partial per slot (never
    # fewer — scan parallelism is sacred, same rule as _bound_state_volume)
    n_splits = min(len(units),
                   slots if (state_bytes or 0) > (1 << 18) else 4 * slots)
    splits: list[dict] = [dict() for _ in range(n_splits)]
    for i, (f, rg) in enumerate(units):
        splits[i % n_splits].setdefault(f, []).append(rg)
    return splits


def _iter_rg_tables(split: dict, cols: list[str], lookahead: int = 2):
    """Yield this split's row groups as pyarrow Tables IN ORDER, decoding
    up to ``lookahead`` groups ahead on one reader thread — parquet decode
    releases the GIL, so it overlaps the caller's kernel work and reclaims
    the vCPU that spark.task.cpus=2 reserves for the (idle, on this path)
    JVM feed thread.  Measured 1.5× on a full single-task pass (decode
    1.5 s ‖ kernel 0.9 s → 1.5 s total).  Deterministic: results are
    consumed in submission order, so fold order — and therefore every
    sketch state — is identical to the sequential loop."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    units = [(p, rg) for p, rgs in split.items() for rg in rgs]
    handles: dict = {}

    def read(p, rg):
        pf = handles.get(p)  # single reader thread — no races
        if pf is None:
            pf = handles[p] = pq.ParquetFile(p)
        return pf.read_row_group(rg, columns=cols)

    with ThreadPoolExecutor(1) as pool:
        futs = deque()
        it = iter(units)
        for _ in range(lookahead):
            u = next(it, None)
            if u is not None:
                futs.append(pool.submit(read, *u))
        while futs:
            t = futs.popleft().result()
            u = next(it, None)
            if u is not None:
                futs.append(pool.submit(read, *u))
            yield t


def _native_parquet_partials(df: DataFrame, sketch, col: str,
                             value_kind: str) -> DataFrame | None:
    """Native-scan build: Python tasks read the parquet row groups directly
    with pyarrow (vectorized C++ decode, zero JVM row↔Arrow transposition)
    and fold them through the same kernels — measured ~25× less CPU than the
    JVM scan → Arrow exchange for the same bytes (guide §4.2: keep the heavy
    lifting in native code; the JVM boundary was ~90% of every build line's
    CPU).  Only taken when the plan is provably a bare projected parquet
    scan and the sketch's merged state is partition-independent, so the
    final blob is bit-identical to the JVM path."""
    if sketch.kind not in _PARTITION_DETERMINISTIC_KINDS:
        return None
    info = _attr_through_projects(df, [col])
    if info is None:
        return None
    (phys_col,), files = info
    spark = df.sparkSession
    from .merge import state_size_estimate
    splits = _parquet_splits(spark, files, [phys_col],
                             state_bytes=state_size_estimate(sketch))
    if splits is None:
        return None
    bc = spark.sparkContext.broadcast(splits)
    elem_kind = "i32" if value_kind == "i32_array" else value_kind

    def partial_fn(batches):
        import pyarrow as pa
        state = sketch.empty()
        n = 0
        for b in batches:
            for sid in b.column(0).to_pylist():
                for t in _iter_rg_tables(bc.value[sid], [phys_col]):
                    arr = t.column(0).combine_chunks()
                    vals = _arrow_values(arr, value_kind)
                    n += _update(sketch, state, vals, elem_kind)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        yield pa.RecordBatch.from_pydict({
            "partition_id": pa.array([pid], pa.int64()),
            "n_items": pa.array([n], pa.int64()),
            "state": pa.array([sketch.serialize(state)], pa.binary()),
        })

    driver = spark.range(0, len(splits), 1, len(splits))
    return driver.mapInArrow(partial_fn, PARTIAL_SCHEMA)


def build_partials(df: DataFrame, sketch, col: str, value_kind: str = "i32_array",
                   repartition: int | None = None) -> DataFrame:
    """→ DataFrame(partition_id long, n_items long, state binary), one row per
    partition.  ``value_kind``: i32_array | i32 | i64 | f64 | str."""
    sel = df.select(F.col(col).alias("v"))  # explicit column pruning
    if repartition:
        sel = sel.repartition(repartition)
    else:
        sel = _bound_state_volume(sel, sketch)

    elem_kind = "i32" if value_kind == "i32_array" else value_kind

    def partial_fn(batches):
        import pyarrow as pa
        state = sketch.empty()
        n = 0
        for b in batches:
            vals = _arrow_values(b.column(0), value_kind)
            n += _update(sketch, state, vals, elem_kind)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        yield pa.RecordBatch.from_pydict({
            "partition_id": pa.array([pid], pa.int64()),
            "n_items": pa.array([n], pa.int64()),
            "state": pa.array([sketch.serialize(state)], pa.binary()),
        })

    return sel.mapInArrow(partial_fn, PARTIAL_SCHEMA)


def build_sketch_preagg(df: DataFrame, sketch, col: str,
                        value_kind: str = "i32_array", fanin: int = 64,
                        shuffle_partitions: int | None = None) -> tuple[bytes, int]:
    """JVM-pre-aggregated build: explode → Tungsten partial groupBy(key) →
    weighted sketch update over (distinct key, count) pairs.

    Exact for weight-insensitive sketches (Bloom/blocked-bloom/HLL: a key's
    multiplicity never matters) and weight-additive ones (CMS counters,
    t-digest centroid weights).  The Python boundary sees only the distinct
    domain — for zipfian token streams that is a ~3000× reduction.  n_items
    still counts every ingested token (sum of weights).
    """
    # The JVM pre-aggregation exists to shrink the JVM→Python boundary
    # (Python sees only the distinct domain).  Under a native parquet scan
    # there IS no boundary — and for the partition-deterministic kinds the
    # direct fold produces a bit-identical final blob (weight-insensitive
    # bits/registers; weight-additive counters fold the same counts), with
    # n_items still the total ingested weight.  Route those there; sketches
    # whose state depends on the (key, weight) stream shape (t-digest, KLL,
    # MG, DDSketch) keep the JVM pre-aggregation below.
    if sketch.kind in ("bloom", "blocked_bloom", "hll", "cms"):
        partials = _native_parquet_partials(df, sketch, col, value_kind)
        if partials is not None:
            from .merge import merge_partials_auto
            return merge_partials_auto(
                partials, sketch, fanin=fanin,
                est_rows=partials.rdd.getNumPartitions())
    if value_kind == "i32_array":
        flat = df.select(F.explode(F.col(col)).alias("v"))
    else:
        flat = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    counts = flat.groupBy("v").agg(F.count("*").alias("cnt"))
    if shuffle_partitions:
        counts = counts.repartition(shuffle_partitions)

    supports_weights = sketch.kind in ("cms", "tdigest", "kll", "mg", "ddsketch")
    elem_kind = "i32" if value_kind == "i32_array" else value_kind

    def partial_fn(batches):
        import pyarrow as pa
        state = sketch.empty()
        n = 0
        for b in batches:
            vals = _arrow_values(b.column(0), elem_kind if elem_kind != "i32" else "i32")
            w = b.column(1).to_numpy(zero_copy_only=False)
            if len(vals) == 0:
                continue
            if sketch.kind == "cms":
                getattr(sketch, f"update_{'str' if elem_kind == 'str' else 'i32'}")(
                    state, vals, weights=w)
            elif sketch.kind in ("kll", "ddsketch"):
                sketch.update_weighted(state, np.asarray(vals, np.float64), w)
            elif sketch.kind == "mg":
                sketch.update_weighted(state, np.asarray(vals, np.int64), w)
            elif sketch.kind == "tdigest":
                state.vmin = min(state.vmin, float(np.min(vals)))
                state.vmax = max(state.vmax, float(np.max(vals)))
                state.n += int(w.sum())
                means = np.concatenate([state.means, np.asarray(vals, np.float64)])
                weights = np.concatenate([state.weights, w.astype(np.float64)])
                state.means, state.weights = sketch._compress(means, weights)
            else:  # weight-insensitive: bloom / blocked_bloom / hll
                _update(sketch, state, vals, elem_kind)
            n += int(w.sum())
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        yield pa.RecordBatch.from_pydict({
            "partition_id": pa.array([pid], pa.int64()),
            "n_items": pa.array([n], pa.int64()),
            "state": pa.array([sketch.serialize(state)], pa.binary()),
        })

    if not supports_weights and sketch.kind not in ("bloom", "blocked_bloom", "hll"):
        raise ValueError(f"pre-aggregated build unsupported for {sketch.kind}")
    from .merge import merge_partials_auto
    partials = counts.mapInArrow(partial_fn, PARTIAL_SCHEMA)
    return merge_partials_auto(partials, sketch)


def build_sketch(df: DataFrame, sketch, col: str, value_kind: str = "i32_array",
                 repartition: int | None = None, fanin: int = 64,
                 checkpoint=None, sketch_id: str | None = None,
                 tree_merge: bool | None = None) -> tuple[bytes, int]:
    """Full build: partials → merge → (final state blob, n_items).

    Merge strategy: AUTO by default — driver-side fold (one job) while
    P × |state| stays under merge.AUTO_TREE_THRESHOLD_BYTES, the fanin-ary
    applyInPandas tree beyond it (thousands of GB-scale Bloom partials must
    never be collect()ed).  ``tree_merge=True``/``False`` forces a path.
    If ``checkpoint`` and ``sketch_id`` are given, partial and final states
    are persisted with lineage — resumable builds.
    """
    from .merge import merge_partials_auto, merge_partials_collect
    partials = None
    if repartition is None:
        partials = _native_parquet_partials(df, sketch, col, value_kind)
    if partials is None:
        partials = build_partials(df, sketch, col, value_kind, repartition)
    partials_direct = partials  # one partial ROW per partition of THIS plan
    if checkpoint is not None and sketch_id is not None:
        partials = checkpoint.write_partials(sketch_id, sketch, partials,
                                             input_desc=_describe_input(df))
    if tree_merge:
        row = merge_partials_tree(partials, sketch, fanin=fanin).collect()[0]
        blob, n_items = bytes(row.state), int(row.n_items)
    elif tree_merge is None:
        # a checkpoint read-back repacks many partial files per scan
        # partition, so take P from the pre-checkpoint plan instead
        blob, n_items = merge_partials_auto(
            partials, sketch, fanin=fanin,
            est_rows=partials_direct.rdd.getNumPartitions())
    else:
        blob, n_items = merge_partials_collect(partials, sketch)
    if checkpoint is not None and sketch_id is not None:
        checkpoint.write_final(sketch_id, sketch, blob, n_items)
    return blob, n_items


def build_delta_partials(df: DataFrame, sketch, col: str, sign_col: str,
                         value_kind: str = "str",
                         repartition: int | None = None) -> DataFrame:
    """Changelog fold: one partial per partition over (key, ±1) rows.

    Distributed deletes for counter-summed sketches (counting bloom):
    inserts carry sign +1, deletes −1; partitions fold their slice with NO
    local presence check (a partition may see a delete for a key inserted
    elsewhere — its counters go locally negative and the merge sum restores
    the global multiset).  Requires the classic counting-filter discipline:
    globally, deletes ≤ inserts per key.  The sketch must implement
    ``update_delta_{str,i32}``.
    """
    # null keys AND null signs are dropped in-plan: _arrow_values drop_null
    # would desync the parallel signs column inside the kernel, and a null
    # sign surviving to to_numpy() becomes NaN → an arbitrary int32 delta
    sel = (df.where(F.col(col).isNotNull() & F.col(sign_col).isNotNull())
           .select(F.col(col).alias("v"),
                   F.col(sign_col).cast("int").alias("s")))
    if repartition:
        sel = sel.repartition(repartition)
    else:
        sel = _bound_state_volume(sel, sketch)
    updater = f"update_delta_{value_kind}"
    if not hasattr(sketch, updater):
        raise ValueError(f"{sketch.kind} does not support signed updates")

    def partial_fn(batches):
        import pyarrow as pa
        state = sketch.empty()
        n = 0
        for b in batches:
            vals = _arrow_values(b.column(0), value_kind)
            signs = b.column(1).to_numpy(zero_copy_only=False).astype(np.int32)
            if len(vals):
                getattr(sketch, updater)(state, vals, signs)
                n += len(vals)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        yield pa.RecordBatch.from_pydict({
            "partition_id": pa.array([pid], pa.int64()),
            "n_items": pa.array([n], pa.int64()),
            "state": pa.array([sketch.serialize(state)], pa.binary()),
        })

    return sel.mapInArrow(partial_fn, PARTIAL_SCHEMA)


# ``src`` is the ORIGIN SCAN PARTITION id, persisted with the row: the
# pre-merge fanin levels group on floor(src / fanin), and deriving it from
# spark_partition_id() at merge time would break after a checkpoint
# write-back (re-read parquet partitions pack many same-shard rows per
# partition, so one (shard, grp) group could exceed the byte budget the
# fanin levels enforce — ADVICE r4).
SHARD_SCHEMA = "shard_id int, src long, n_items long, state binary"

# Above this dense-state size the monolithic changelog fold is routed to the
# sharded path: blob-per-partition states this wide would otherwise force
# either a scan coalesce (losing parallelism) or GB-scale rows through a
# near-binary serial merge tree (BENCH/wide_state_fold.json).
SHARD_ROUTE_THRESHOLD_BYTES = 32 << 20


def build_delta_shard_partials(df: DataFrame, sketch, col: str, sign_col: str,
                               value_kind: str = "str",
                               n_shards: int | None = None,
                               repartition: int | None = None) -> DataFrame:
    """Changelog fold emitting SHARDED partials: each partition folds its
    slice into a local dense counter array, then ships it as ``n_shards``
    column-range rows (shard_id, n_items, state) — sparse-encoded when few
    cells are touched, so per-partition shuffle bytes track the rows the
    partition actually wrote (≈ rows × k × 8 B), not the filter width.

    Scan parallelism is NEVER coalesced here (that is the point): the merge
    is a single groupBy(shard_id) with one reducer per shard, so a 1000-task
    scan of a 10^10-cell filter shuffles data-proportional bytes into
    width-proportional parallel reducers.  Per-task transient memory is
    data-proportional too: partitions accumulate sparse (cell, ±delta)
    pairs (12 B per key-hash) and only materialize the dense local array
    once the pairs would outweigh it (≥ m/3 entries) — a small partition
    against a 10^10-cell filter never allocates the filter.  ``n_items``
    rides only shard-0 rows so the global count sums cleanly."""
    if not hasattr(sketch, "serialize_shard"):
        raise ValueError(f"{sketch.kind} does not support sharded states")
    sel = (df.where(F.col(col).isNotNull() & F.col(sign_col).isNotNull())
           .select(F.col(col).alias("v"),
                   F.col(sign_col).cast("int").alias("s")))
    if repartition:
        sel = sel.repartition(repartition)
    if n_shards is None:
        n_shards = sketch.shard_count()
    updater = f"update_delta_{value_kind}"
    if not hasattr(sketch, updater):
        raise ValueError(f"{sketch.kind} does not support signed updates")
    # entries beyond which the sparse pair buffers (12 B each) cost more
    # than the dense array (4 B per cell) — switch point of the fold
    dense_break = sketch.params.m // 3

    def partial_fn(batches):
        import pyarrow as pa
        dense = None
        idx_chunks, d_chunks, entries = [], [], 0
        n = 0
        for b in batches:
            vals = _arrow_values(b.column(0), value_kind)
            signs = b.column(1).to_numpy(zero_copy_only=False).astype(np.int32)
            if len(vals) == 0:
                continue
            n += len(vals)
            if dense is None:
                ci, cd = sketch.delta_cells(vals, signs, value_kind)
                idx_chunks.append(ci)
                d_chunks.append(cd)
                entries += ci.size
                if entries > dense_break:  # sparse no longer pays — switch
                    dense = sketch.empty()
                    for a, dl in zip(idx_chunks, d_chunks):
                        np.add.at(dense, a, dl)
                    idx_chunks, d_chunks = [], []
            else:
                getattr(sketch, updater)(dense, vals, signs)
        if dense is not None:
            blobs = [sketch.serialize_shard(dense, i, n_shards)
                     for i in range(n_shards)]
        else:
            idx = (np.concatenate(idx_chunks) if idx_chunks
                   else np.empty(0, np.int64))
            dl = (np.concatenate(d_chunks) if d_chunks
                  else np.empty(0, np.int32))
            # one sort, then each shard slices its contiguous cell range —
            # emission is O(E log E + shards), not O(shards × E)
            order = np.argsort(idx, kind="stable")
            idx, dl = idx[order], dl[order]
            lows = [sketch.shard_bounds(i, n_shards)[0] for i in range(n_shards)]
            cuts = np.searchsorted(idx, lows + [sketch.params.m])
            blobs = [sketch.serialize_shard_from_cells(
                idx[cuts[i]:cuts[i + 1]], dl[cuts[i]:cuts[i + 1]],
                i, n_shards) for i in range(n_shards)]
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        yield pa.RecordBatch.from_pydict({
            "shard_id": pa.array(list(range(n_shards)), pa.int32()),
            "src": pa.array([pid] * n_shards, pa.int64()),
            "n_items": pa.array([n] + [0] * (n_shards - 1), pa.int64()),
            "state": pa.array(blobs, pa.binary()),
        })

    return sel.mapInArrow(partial_fn, SHARD_SCHEMA)


def merge_shard_partials(partials: DataFrame, sketch,
                         est_partials: int | None = None) -> DataFrame:
    """(shard_id, n_items, state)* → ONE dense row per shard via
    groupBy(shard_id) counter-sum waves — merge parallelism = n_shards, and
    each reducer holds one shard accumulator, never the whole filter.

    Per-task INPUT is byte-bounded too: applyInPandas materializes a whole
    group, so a P-partition scan would hand one reducer P same-shard blobs
    (1000 dense 8 MB partials = 8 GB in one task).  When P exceeds the
    byte-aware fanin (merge budget / dense shard bytes), pre-merge levels
    keyed by (shard_id, floor(src / fanin)) fold fanin-sized slices first —
    src renumbers densely each level (same invariant as merge._tree_level),
    so every task's input stays ≈ the merge byte budget regardless of P."""
    from .merge import AUTO_TREE_THRESHOLD_BYTES, state_size_estimate
    cls = type(sketch)
    shard_sz = max(1, state_size_estimate(sketch) // sketch.shard_count())
    fanin = max(2, int(AUTO_TREE_THRESHOLD_BYTES // shard_sz))
    if est_partials is None:
        est_partials = partials.rdd.getNumPartitions()

    def merge_level(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("src")  # reproducible fold order
        blob = cls.merge_shard_blobs(list(pdf["state"]))
        return pd.DataFrame({"shard_id": [int(pdf["shard_id"].iloc[0])],
                             "src": [int(pdf["grp"].iloc[0])],
                             "n_items": [int(pdf["n_items"].sum())],
                             "state": [blob]})

    def merge_final(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("src")
        blob = cls.merge_shard_blobs(list(pdf["state"]))
        return pd.DataFrame({"shard_id": [int(pdf["shard_id"].iloc[0])],
                             "n_items": [int(pdf["n_items"].sum())],
                             "state": [blob]})

    if "src" not in partials.columns:
        # legacy input (pre-src layout): one mapInArrow task per scan
        # partition means the physical partition id IS the origin — only
        # sound because nothing re-partitioned between fold and merge
        partials = partials.withColumn("src", F.spark_partition_id())
    df = partials
    p = est_partials
    while p > fanin:
        df = (df.withColumn("grp", F.floor(F.col("src") / fanin))
                .groupBy("shard_id", "grp")
                .applyInPandas(merge_level, SHARD_SCHEMA))
        p = -(-p // fanin)
    return df.groupBy("shard_id").applyInPandas(
        merge_final, "shard_id int, n_items long, state binary")


def build_delta_sketch_sharded(df: DataFrame, sketch, col: str, sign_col: str,
                               value_kind: str = "str",
                               n_shards: int | None = None,
                               repartition: int | None = None,
                               checkpoint=None,
                               sketch_id: str | None = None) -> tuple[bytes, int]:
    """Sharded changelog fold → merged monolithic state blob (bit-identical
    to the monolithic path — integer counter addition commutes, so shard
    order and partition order never matter).  With ``checkpoint`` +
    ``sketch_id`` the shard partials persist to the lineage table first
    (level = SHARD_LEVEL) and the merge consumes the checkpointed rows —
    wide-state builds resume exactly like monolithic ones."""
    partials = build_delta_shard_partials(df, sketch, col, sign_col,
                                          value_kind, n_shards, repartition)
    est = partials.rdd.getNumPartitions()
    if checkpoint is not None and sketch_id is not None:
        partials = checkpoint.write_shard_partials(
            sketch_id, sketch, partials, input_desc=_describe_input(df))
    rows = merge_shard_partials(partials, sketch, est_partials=est).collect()
    if not rows:
        return sketch.serialize(sketch.empty()), 0
    blob = type(sketch).reassemble_shards([r.state for r in rows])
    n_items = int(sum(r.n_items for r in rows))
    if checkpoint is not None and sketch_id is not None:
        checkpoint.write_final(sketch_id, sketch, blob, n_items)
    return blob, n_items


def build_delta_sketch(df: DataFrame, sketch, col: str, sign_col: str,
                       value_kind: str = "str", fanin: int = 64,
                       repartition: int | None = None,
                       sharded: bool | None = None,
                       checkpoint=None,
                       sketch_id: str | None = None) -> tuple[bytes, int]:
    """Changelog fold → merged state blob (see build_delta_partials).

    Routing: AUTO by default — the monolithic blob-per-partition fold while
    the dense state stays under SHARD_ROUTE_THRESHOLD_BYTES, the sharded
    column-range fold beyond it (build_delta_shard_partials).  Measured at
    sf1 (2^25-counter / 134 MB state): 143.6 s monolithic → sharded keeps
    full scan parallelism and one parallel merge wave."""
    from .merge import merge_partials_auto, state_size_estimate
    if sharded is None:
        sharded = (hasattr(sketch, "serialize_shard")
                   and state_size_estimate(sketch) > SHARD_ROUTE_THRESHOLD_BYTES)
    if sharded:
        return build_delta_sketch_sharded(df, sketch, col, sign_col,
                                          value_kind, repartition=repartition,
                                          checkpoint=checkpoint,
                                          sketch_id=sketch_id)
    partials = build_delta_partials(df, sketch, col, sign_col, value_kind,
                                    repartition)
    est_rows = None
    if checkpoint is not None and sketch_id is not None:
        # capture BEFORE the checkpoint round-trip: a read-back packs many
        # partial rows per parquet partition, so getNumPartitions inside
        # merge_partials_auto would under-count and mis-route a large fleet
        # to the driver collect (ADVICE r4; same pitfall build_sketch avoids)
        est_rows = partials.rdd.getNumPartitions()
        partials = checkpoint.write_partials(
            sketch_id, sketch, partials, input_desc=_describe_input(df))
    blob, n = merge_partials_auto(partials, sketch, fanin=fanin,
                                  est_rows=est_rows)
    if checkpoint is not None and sketch_id is not None:
        checkpoint.write_final(sketch_id, sketch, blob, n)
    return blob, n


def _describe_input(df: DataFrame) -> str:
    try:
        files = df.inputFiles()
        return ";".join(sorted(files)[:16]) + (f";+{len(files)-16}" if len(files) > 16 else "")
    except Exception:
        return "<derived>"


GROUPED_SCHEMA = "group string, n_items long, state binary"


def _native_grouped_partials(df: DataFrame, sketch, group_col: str, col: str,
                             value_kind: str) -> DataFrame | None:
    """Map-side grouped build over a NATIVE parquet scan: Python tasks read
    (group, values) row groups directly and fold them through the exact
    phase-1 kernel the JVM-fed path uses — same per-group partial semantics,
    none of the JVM row↔Arrow transposition.  Eligibility mirrors
    _native_parquet_partials, plus the group column must already be a
    parquet string column (the plan-side cast("string") must be an
    identity for the fold to see identical labels)."""
    if sketch.kind not in _PARTITION_DETERMINISTIC_KINDS:
        return None
    info = _attr_through_projects(df, [group_col, col])
    if info is None:
        return None
    (g_phys, v_phys), files = info
    if g_phys == v_phys:
        return None
    spark = df.sparkSession
    from .merge import state_size_estimate
    splits = _parquet_splits(spark, files, [g_phys, v_phys],
                             need_types={g_phys: "string"},
                             state_bytes=state_size_estimate(sketch))
    if splits is None:
        return None
    bc = spark.sparkContext.broadcast(splits)
    array_input = value_kind == "i32_array"
    elem_kind = "i32" if array_input else value_kind
    phase1 = _grouped_phase1_fn(sketch, array_input, elem_kind, 1)

    def native_fn(batches):
        import pyarrow as pa

        def rg_batches():
            for b in batches:
                for sid in b.column(0).to_pylist():
                    for t in _iter_rg_tables(bc.value[sid],
                                             [g_phys, v_phys]):
                        yield pa.RecordBatch.from_arrays(
                            [t.column(g_phys).combine_chunks(),
                             t.column(v_phys).combine_chunks()],
                            ["group", "v"])

        yield from phase1(rg_batches())

    driver = spark.range(0, len(splits), 1, len(splits))
    return driver.mapInArrow(native_fn, GROUPED_SCHEMA)


def _grouped_phase1_fn(sketch, array_input: bool, elem_kind: str,
                       value_col_idx: int):
    """Arrow-native grouped partial pass shared by the map-side and salted
    strategies: dictionary-encode the group labels, bucket token values by
    np.repeat of the label codes, fold one sketch state per group seen —
    no pandas object columns, no per-row Python (string values are filtered
    group-by-group with Arrow compute, not a zip loop)."""

    def phase1(batches):
        import pyarrow as pa
        states: dict[str, list] = {}
        for b in batches:
            enc = b.column(0).dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            groups = enc.dictionary.to_pylist()
            vcol = b.column(value_col_idx)
            str_input = elem_kind == "str" and not array_input
            if array_input:
                import pyarrow.compute as pc
                # list_value_length is null for null rows; flatten() skips
                # them, so zero-fill keeps owner/flat aligned
                lengths = pc.list_value_length(vcol).fill_null(0) \
                    .to_numpy(zero_copy_only=False)
                flat = vcol.flatten().to_numpy(zero_copy_only=False).astype(
                    np.int32, copy=False)
                owner = np.repeat(codes, lengths)
            elif str_input:
                flat = vcol  # stays an Arrow array; filtered per group below
                owner = codes
            else:
                flat = vcol.to_numpy(zero_copy_only=False)
                owner = codes
            for gi, gname in enumerate(groups):
                mask = owner == gi
                if str_input:
                    filt = flat.filter(pa.array(mask)).drop_null()
                    buf = arrow_strbuf(filt)
                    vals = buf if buf is not None else filt.to_pylist()
                else:
                    vals = flat[mask]
                if gname not in states:
                    states[gname] = [sketch.empty(), 0]
                states[gname][1] += _update(sketch, states[gname][0], vals, elem_kind)
        yield pa.RecordBatch.from_pydict({
            "group": pa.array(list(states.keys()), pa.string()),
            "n_items": pa.array([v[1] for v in states.values()], pa.int64()),
            "state": pa.array([sketch.serialize(v[0]) for v in states.values()],
                              pa.binary()),
        })

    return phase1


def _grouped_phase2_fn(sketch):
    def phase2(pdf: pd.DataFrame) -> pd.DataFrame:
        from .merge import merge_blobs
        blob, n = merge_blobs(sketch, list(pdf["state"]), pdf["n_items"].sum())
        return pd.DataFrame({"group": [pdf["group"].iloc[0]], "n_items": [n],
                             "state": [blob]})
    return phase2


# A map-side grouped build holds ALL G group states in EVERY task; above
# this budget of G × |dense state| the auto router falls back to the salted
# repartition, whose per-task state memory divides by the partition count.
MAPSIDE_STATE_BUDGET_BYTES = 256 << 20


def _choose_grouped_strategy(df: DataFrame, sketch, group_col: str,
                             group_cardinality: int | None) -> tuple[str, int]:
    """mapside vs salted on estimated group cardinality: G × |state| within
    the task budget → map-side combine (no data shuffle); beyond it →
    salted repartition (task memory divides by P).  ``group_cardinality``
    skips the approx_count_distinct job when the caller knows the domain."""
    from .merge import state_size_estimate
    if group_cardinality is None:
        group_cardinality = int(df.select(
            F.approx_count_distinct(group_col, rsd=0.15)).collect()[0][0])
    est_bytes = group_cardinality * state_size_estimate(sketch)
    if est_bytes > MAPSIDE_STATE_BUDGET_BYTES:
        import logging
        logging.getLogger("bloom_filter_spark").warning(
            "build_grouped: ~%d groups x %d-byte states (= %.1f MB) exceeds "
            "the %d MB map-side task budget; routing to strategy='salted'",
            group_cardinality, state_size_estimate(sketch), est_bytes / 1e6,
            MAPSIDE_STATE_BUDGET_BYTES >> 20)
        return "salted", group_cardinality
    return "mapside", group_cardinality


def build_grouped(df: DataFrame, sketch, group_col: str, col: str,
                  value_kind: str = "i32_array", n_salts: int = 16,
                  salt_on: str | None = None,
                  num_partitions: int | None = None,
                  strategy: str = "auto",
                  group_cardinality: int | None = None) -> DataFrame:
    """One sketch per group as a two-phase mergeable aggregation.  NOTE:
    the default ``strategy="auto"`` runs an extra ``approx_count_distinct``
    job over ``group_col`` unless ``group_cardinality`` is passed — callers
    that pin ``strategy=`` or pass the cardinality pay no estimate job
    (ADVICE r4).  → DataFrame(group string, n_items long, state binary).

    ``strategy="auto"``: route on estimated group cardinality —
    map-side combine while G × |state| fits the task budget, salted beyond
    it (a 10^5-group × MB-state domain would OOM every map-side task).  Note: for
    ORDER-SENSITIVE sketches (KLL / t-digest / MG compaction) the two
    routes fold in different groupings, so a data-dependent route flip can
    change state bytes (estimates stay within each sketch's published
    bounds — the mergeable-sketch contract); pin ``strategy=`` when
    bit-reproducibility across runs matters more than the OOM guard.

    ``strategy="mapside"``: phase 1 folds each INPUT partition's
    rows into one partial per group it contains — the token data never
    shuffles at all (classic map-side combine); only the P × G small state
    rows move into the phase-2 merge.  Skew-immune by construction: tasks
    are input splits, so a 45 %-heavy group costs each task at most its own
    split.  Memory is G_local × |state| per task — right whenever the group
    domain is modest (sources, languages, shards).  At 10^12 rows this is
    the only strategy whose shuffle volume is independent of input size.

    ``strategy="salted"``: the north rule's explicit salted repartition —
    phase 1 after ``repartition(group, salt)`` (caps any single task at
    group/n_salts rows), phase 2 merges the n_salts states per group.
    Right when the group domain is too large for G × |state| to sit in one
    task's memory, at the price of shuffling the full data once.
    """
    array_input = value_kind == "i32_array"
    elem_kind = "i32" if array_input else value_kind
    phase2 = _grouped_phase2_fn(sketch)

    if strategy == "auto":
        strategy, _ = _choose_grouped_strategy(df, sketch, group_col,
                                               group_cardinality)

    if strategy == "mapside":
        partials = None
        if not num_partitions:
            partials = _native_grouped_partials(df, sketch, group_col, col,
                                                value_kind)
        if partials is None:
            base = df.select(F.col(group_col).cast("string").alias("group"),
                             F.col(col).alias("v"))
            if num_partitions:
                base = base.repartition(num_partitions)
            phase1 = _grouped_phase1_fn(sketch, array_input, elem_kind, 1)
            partials = base.mapInArrow(phase1, GROUPED_SCHEMA)
        return partials.groupBy("group").applyInPandas(phase2, GROUPED_SCHEMA)

    if strategy != "salted":
        raise ValueError(f"unknown grouped-build strategy {strategy!r}")
    salt_src = (F.xxhash64(F.col(salt_on)) if salt_on
                else F.xxhash64(F.monotonically_increasing_id()))
    base = df.select(
        F.col(group_col).cast("string").alias("group"),
        F.pmod(salt_src, F.lit(n_salts)).alias("salt"),
        F.col(col).alias("v"),
    )
    shuffled = base.repartition(num_partitions, "group", "salt") if num_partitions \
        else base.repartition("group", "salt")
    phase1 = _grouped_phase1_fn(sketch, array_input, elem_kind, 2)
    partials = shuffled.mapInArrow(phase1, GROUPED_SCHEMA)
    return partials.groupBy("group").applyInPandas(phase2, GROUPED_SCHEMA)


def build_grouped_preagg(df: DataFrame, sketch, group_col: str, col: str,
                         value_kind: str = "i32_array") -> DataFrame:
    """Grouped build through a JVM partial aggregation — the skew-proof path
    for modest key domains.

    explode → groupBy(group, key).count(): the shuffle keys are (group, key)
    PAIRS, uniformly hashed, so a 45 %-heavy group spreads over the whole
    cluster with no salting at all; Python then sees only the per-group
    distinct domain with weights.  Exact for weight-insensitive sketches
    (Bloom/HLL) and weight-additive ones (CMS/t-digest).
    → DataFrame(group string, n_items long, state binary).
    """
    if sketch.kind not in ("bloom", "blocked_bloom", "hll", "cms", "tdigest",
                           "kll", "ddsketch"):
        raise ValueError(f"pre-aggregated grouped build unsupported for {sketch.kind}")
    elem_kind = "i32" if value_kind == "i32_array" else value_kind
    v = F.explode(F.col(col)) if value_kind == "i32_array" else F.col(col)
    flat = (df.select(F.col(group_col).cast("string").alias("group"), v.alias("v"))
            .where(F.col("v").isNotNull()))  # null keys are not insertable
    counts = flat.groupBy("group", "v").agg(F.count("*").alias("cnt"))

    def phase1(batches):
        import pyarrow as pa
        states: dict[str, list] = {}
        for b in batches:
            enc = b.column(0).dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            groups = enc.dictionary.to_pylist()
            vals_all = (b.column(1) if elem_kind == "str"
                        else b.column(1).to_numpy(zero_copy_only=False))
            w_all = b.column(2).to_numpy(zero_copy_only=False)
            for gi, gname in enumerate(groups):
                mask = codes == gi
                if elem_kind == "str":
                    vals = vals_all.filter(pa.array(mask)).to_pylist()
                else:
                    vals = vals_all[mask]
                w = w_all[mask]
                if gname not in states:
                    states[gname] = [sketch.empty(), 0]
                st, _ = states[gname][0], None
                if sketch.kind == "cms":
                    getattr(sketch, f"update_{'str' if elem_kind == 'str' else 'i32'}")(
                        st, vals, weights=w)
                elif sketch.kind in ("kll", "ddsketch"):
                    sketch.update_weighted(st, np.asarray(vals, np.float64), w)
                elif sketch.kind == "tdigest":
                    arr = np.asarray(vals, np.float64)
                    st.vmin = min(st.vmin, float(arr.min()))
                    st.vmax = max(st.vmax, float(arr.max()))
                    st.n += int(w.sum())
                    means = np.concatenate([st.means, arr])
                    weights = np.concatenate([st.weights, w.astype(np.float64)])
                    st.means, st.weights = sketch._compress(means, weights)
                else:
                    _update(sketch, st, vals, elem_kind)
                states[gname][1] += int(w.sum())
        yield pa.RecordBatch.from_pydict({
            "group": pa.array(list(states.keys()), pa.string()),
            "n_items": pa.array([s[1] for s in states.values()], pa.int64()),
            "state": pa.array([sketch.serialize(s[0]) for s in states.values()],
                              pa.binary()),
        })

    def phase2(pdf: pd.DataFrame) -> pd.DataFrame:
        from .merge import merge_blobs
        blob, n = merge_blobs(sketch, list(pdf["state"]), pdf["n_items"].sum())
        return pd.DataFrame({"group": [pdf["group"].iloc[0]], "n_items": [n],
                             "state": [blob]})

    partials = counts.mapInArrow(phase1, GROUPED_SCHEMA)
    return partials.groupBy("group").applyInPandas(phase2, GROUPED_SCHEMA)


def build_grouped_single_writer(df: DataFrame, kind: str, params, group_col: str,
                                col: str, value_kind: str = "str") -> DataFrame:
    """Single-writer grouped build for non-mergeable sketches (cuckoo).

    The whole group flows through ONE task (the reference's insert semantics
    are inherently sequential — /root/reference/filter/cuckoo/filter.go:39-66
    random-walk eviction); the eviction RNG is seeded from the group name so
    builds are deterministic.  Returns (group, n_items, n_failed, state).
    """
    cls = sketch_for_kind(kind)
    array_input = value_kind == "i32_array"

    def build_one(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = cls(params)
        state = sk.empty()
        group = pdf["group"].iloc[0]
        rng_seed = zlib.crc32(str(group).encode())  # process-stable, unlike hash()
        if array_input:
            vals = _flatten_arrays(pdf["v"])
            failed = sk.insert_i32(state, vals, rng_seed)
            n = int(vals.size)
        elif value_kind == "str":
            vals = [v for v in pdf["v"].dropna()]
            failed = sk.insert_str(state, vals, rng_seed)
            n = len(vals)
        else:
            vals = pdf["v"].dropna().to_numpy()
            failed = sk.insert_i32(state, np.asarray(vals, np.int32), rng_seed)
            n = int(len(vals))
        return pd.DataFrame({"group": [group], "n_items": [n],
                             "n_failed": [failed], "state": [sk.serialize(state)]})

    base = df.select(F.col(group_col).cast("string").alias("group"), F.col(col).alias("v"))
    return base.groupBy("group").applyInPandas(
        build_one, "group string, n_items long, n_failed long, state binary")

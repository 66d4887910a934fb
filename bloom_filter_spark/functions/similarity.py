"""Similarity search over embedding columns (array<float>).

Two paths:
  brute-force top-k — exact baseline: broadcast the (small) query set,
    JVM-side cosine via zip_with/aggregate (stays in codegen, no Python),
    window top-k per query.  Correct at any scale where queries are few;
    cost is one scan of the corpus per batch of queries.
  LSH-bucketed ANN — the 100 TB path: random-hyperplane signatures bucket
    the corpus once (linear scan, numpy batch math); queries probe only
    their bucket's candidates.  Recall < 1 by construction (rows-only
    correctness check; recall measured against brute force in pytest).

Near-dup pairs (cosine ≥ τ) reuse the signature buckets as the blocking
join for the pairwise case.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..core import hashing
from .common import spread as _spread


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k per query vector (excluding self).

    → (query_id, neighbor_id, sim, rank); sim rounded 6dp, ties broken by
    neighbor_id so output is deterministic.
    """
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).cast("array<double>").alias("cv"))
    scored = (c.crossJoin(F.broadcast(q))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("sim_raw", _cosine(F.col("qv"), F.col("cv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("sim_raw", 6).alias("sim"),
                    F.col("rank").cast("int").alias("rank")))


def neardup_pairs(emb: DataFrame, threshold: float = 0.45,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All pairs with cosine ≥ threshold — exact, via self-join.

    The corpus side of the plan is the same scan twice with a theta-join on
    id ordering; at 100 TB this becomes lsh_neardup_pairs (blocking buckets),
    kept exact here as the oracle-matched operator.
    """
    a = emb.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).cast("array<double>").alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).cast("array<double>").alias("vb"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("sim_raw", _cosine(F.col("va"), F.col("vb")))
            .where(F.col("sim_raw") >= threshold)
            .select("id_a", "id_b", F.round("sim_raw", 6).alias("sim")))


# ---------------------------------------------------------------- LSH ANN
def hyperplane_signatures(emb: DataFrame, n_bits: int = 16,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          seed: int = 0xA11CE) -> DataFrame:
    """Random-hyperplane signature per vector (numpy batch matmul)."""
    id_type = emb.schema[id_col].dataType.simpleString()

    def sign(it):
        planes = None
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if planes is None:
                rng = np.random.default_rng(seed)
                planes = rng.standard_normal((mat.shape[1], n_bits))
            bits = (mat @ planes > 0).astype(np.uint64)
            sig = (bits << np.arange(n_bits, dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64)
            yield pd.DataFrame({"id": pdf[id_col], "bucket": sig.astype(np.int64)})

    return _spread(emb.select(id_col, vec_col)).mapInPandas(
        sign, f"id {id_type}, bucket bigint")


def hyperplane_buckets(emb: DataFrame, n_bits: int, n_tables: int,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       seed: int = 0xA11CE) -> DataFrame:
    """(id, table, bucket) for ALL tables in ONE scan of the corpus.

    Each table t uses planes drawn from rng(seed + t) — bit-identical to
    calling hyperplane_signatures per table, but the matmul is one
    (n, dim) @ (dim, n_tables*n_bits) per Arrow batch instead of n_tables
    separate passes over the data; at 100 TB this is the difference between
    one corpus scan and n_tables of them.
    """
    id_type = emb.schema[id_col].dataType.simpleString()

    def sign(it):
        planes = None
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if planes is None:
                planes = np.concatenate(
                    [np.random.default_rng(seed + t).standard_normal(
                        (mat.shape[1], n_bits)) for t in range(n_tables)], axis=1)
            bits = (mat @ planes > 0).astype(np.uint64)        # (n, T*b)
            bits = bits.reshape(len(pdf), n_tables, n_bits)
            sig = (bits << np.arange(n_bits, dtype=np.uint64)[None, None, :]).sum(
                axis=2, dtype=np.uint64).astype(np.int64)      # (n, T)
            yield pd.DataFrame({
                "id": pdf[id_col].repeat(n_tables).reset_index(drop=True),
                "table": np.tile(np.arange(n_tables, dtype=np.int32), len(pdf)),
                "bucket": sig.reshape(-1),
            })

    return _spread(emb.select(id_col, vec_col)).mapInPandas(
        sign, f"id {id_type}, table int, bucket bigint")


def lsh_neardup_pairs(emb: DataFrame, threshold: float = 0.45,
                      n_bits: int = 4, n_tables: int = 64,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      seed: int = 0xA11CE) -> DataFrame:
    """Near-dup pairs (cosine ≥ threshold) via hyperplane-LSH blocking —
    the 100 TB replacement for neardup_pairs' exact all-pairs theta join.

    Plan shape: one corpus scan → (id, table, bucket) → self-EQUI-join on
    (table, bucket) for candidates (never a cartesian) → exact cosine on
    candidates only, computed identically to neardup_pairs so the surviving
    pair set is a subset of the exact result with recall
    1 - (1 - p^n_bits)^n_tables per pair, p = 1 - acos(sim)/π.

    Parameter guidance: collision prob decays with angle, so LOW thresholds
    need narrow tables (defaults 4 bits × 64 tables ⇒ miss ≈ 4e-6 at
    sim = 0.45); real near-dup corpora (τ ≥ 0.85, p ≥ 0.86) should use
    16-bit tables (0.86^16 ≈ 0.09 per table, 64 tables ⇒ recall 0.998)
    where random collisions are ~2^-16 per table — that is the regime where
    blocking beats all-pairs by orders of magnitude.
    """
    b = hyperplane_buckets(emb, n_bits, n_tables, id_col, vec_col, seed)
    cand = (b.alias("x")
            .join(b.alias("y"),
                  (F.col("x.table") == F.col("y.table"))
                  & (F.col("x.bucket") == F.col("y.bucket"))
                  & (F.col("x.id") < F.col("y.id")))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct())
    va = emb.select(F.col(id_col).alias("id_a"),
                    F.col(vec_col).cast("array<double>").alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"),
                    F.col(vec_col).cast("array<double>").alias("vb"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .withColumn("sim_raw", _cosine(F.col("va"), F.col("vb")))
            .where(F.col("sim_raw") >= threshold)
            .select("id_a", "id_b", F.round("sim_raw", 6).alias("sim")))


# ---------------------------------------------------------------- IVF ANN
def train_ivf_centroids(emb: DataFrame, n_lists: int = 16, n_iters: int = 8,
                        sample_n: int = 20_000, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        seed: int = 0x1BF_5EED) -> np.ndarray:
    """Spherical k-means coarse quantizer trained on a deterministic sample.

    Standard IVF practice at 100 TB: the quantizer is a tiny model (n_lists ×
    dim floats) trained on a bounded sample — one ordered-limit scan — and
    broadcast; the corpus-wide work (assignment) stays distributed.  Lloyd
    iterations with max-dot-product assignment on L2-normalized vectors;
    empty cells are reseeded deterministically from the sample.
    """
    pdf = (emb.orderBy(id_col).limit(sample_n)
           .select(vec_col).toPandas())
    x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), n_lists, replace=False)].copy()
    for _ in range(n_iters):
        assign = (x @ cents.T).argmax(axis=1)
        for c in range(n_lists):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
            else:  # deterministic reseed from the farthest point
                far = (x @ cents.T).max(axis=1).argmin()
                cents[c] = x[far]
    return cents


def ivf_assign(emb: DataFrame, centroids: np.ndarray, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, list_id): nearest-centroid cell per vector — one mapInPandas
    matmul per Arrow batch against the broadcast quantizer."""
    id_type = emb.schema[id_col].dataType.simpleString()
    cents = centroids

    def assign(it):
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame({"id": pdf[id_col],
                                "list_id": (mat @ cents.T).argmax(axis=1)
                                .astype(np.int32)})

    return _spread(emb.select(id_col, vec_col)).mapInPandas(
        assign, f"id {id_type}, list_id int")


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
             n_lists: int = 16, n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 0x1BF_5EED) -> DataFrame:
    """IVF ANN top-k: corpus bucketed once by nearest centroid; each query
    scans only its n_probe closest cells (bucket equi-join, never all-pairs),
    exact cosine on the candidates.

    n_probe == n_lists degenerates to an EXHAUSTIVE scan — then the result
    must equal brute_force_topk exactly, which is the oracle-backed driver
    query: it proves the cell partition loses/duplicates no vector and the
    candidate join + scoring pipeline is exact.  The recall path
    (n_probe < n_lists) is checked against brute force in pytest.
    """
    spark = emb.sparkSession
    cents = train_ivf_centroids(emb, n_lists, id_col=id_col, vec_col=vec_col,
                                seed=seed)
    corpus = (emb.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).cast("array<double>").alias("cv"))
              .join(ivf_assign(emb, cents, id_col, vec_col)
                    .withColumnRenamed("id", "neighbor_id"), "neighbor_id"))
    # query → its n_probe nearest cells (tiny: |queries| × n_probe rows)
    qv = {int(r[0]): np.asarray(r[1], np.float64)
          for r in emb.where(F.col(id_col).isin(query_ids))
          .select(id_col, vec_col).collect()}
    probes = []
    for qid, v in qv.items():
        vn = v / max(np.linalg.norm(v), 1e-12)
        order = np.argsort(-(cents @ vn))[:n_probe]
        probes += [(qid, int(c)) for c in order]
    probe_df = spark.createDataFrame(probes, f"query_id {emb.schema[id_col].dataType.simpleString()}, list_id int")
    q = spark.createDataFrame(
        [(qid, v.tolist()) for qid, v in qv.items()],
        f"query_id {emb.schema[id_col].dataType.simpleString()}, qv array<double>")
    cand = (corpus.join(F.broadcast(probe_df), "list_id")
            .join(F.broadcast(q), "query_id")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("sim_raw", _cosine(F.col("qv"), F.col("cv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), F.asc("neighbor_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("sim_raw", 6).alias("sim"),
                    F.col("rank").cast("int").alias("rank")))


def lsh_topk(emb: DataFrame, query_ids: list[int], k: int = 5, n_bits: int = 4,
             n_tables: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: probe only the query's hyperplane buckets (multi-table LSH
    for recall), exact cosine on the candidates.  Recall measured vs brute
    force in tests; the candidate join is bucket-equi, never all-pairs.
    Bucketing is one corpus scan for all tables (hyperplane_buckets)."""
    sig = hyperplane_buckets(emb, n_bits, n_tables, id_col, vec_col, seed=0xA11CE)
    corpus = emb.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).cast("array<double>").alias("cv")) \
                .join(sig.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
    q = emb.where(F.col(id_col).isin(query_ids)) \
           .select(F.col(id_col).alias("query_id"),
                   F.col(vec_col).cast("array<double>").alias("qv")) \
           .join(sig.withColumnRenamed("id", "query_id"), "query_id") \
           .withColumnRenamed("bucket", "qbucket") \
           .withColumnRenamed("table", "qtable")
    cand = (corpus.join(F.broadcast(q),
                        (F.col("bucket") == F.col("qbucket"))
                        & (F.col("table") == F.col("qtable")))
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "qv", "neighbor_id", "cv").distinct()
            .withColumn("sim_raw", _cosine(F.col("qv"), F.col("cv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), F.asc("neighbor_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("sim_raw", 6).alias("sim"),
                    F.col("rank").cast("int").alias("rank")))


QUANT_MAX = 127


def quantize_embeddings_int8(df: DataFrame, vec_col: str = "embedding",
                             id_col: str = "vec_id") -> DataFrame:
    """Per-vector symmetric int8 quantization — the 4× embedding-storage
    compression step of a training/retrieval pipeline:
    scale = max(|v|)/127, q_i = clamp(floor(v_i/scale + 0.5), −127, 127)
    (explicit floor(x+0.5) half-up so EVERY engine computes identical
    integers — numpy's round() is half-even and SQL engines vary).
    All-zero vectors quantize to zeros with scale 0.

    → (id, n_dims, sum_q, sum_abs_q, max_q, min_q): exact integer
    summaries of the quantized vector (the driver-gate shape; callers
    wanting the int8 payload take ``q`` from the same kernel).  Scale
    shape: ONE mapInArrow pass reading the list column's flat float32
    buffer zero-copy — per-batch numpy, no explode, no shuffle; output is
    one short row per vector."""
    import pyarrow as pa

    def kernel(batches):
        for b in batches:
            ids = b.column(0)
            col = b.column(1)
            if col.null_count:
                keep = pa.compute.is_valid(col)
                col = col.filter(keep)
                ids = ids.filter(keep)
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64, copy=False)
            n = len(col)
            if n == 0:
                continue
            lens = offs[1:] - offs[:-1]
            owner = np.repeat(np.arange(n), lens)
            absmax = np.zeros(n, np.float64)
            np.maximum.at(absmax, owner, np.abs(flat))
            scale = absmax / QUANT_MAX
            safe = np.where(scale > 0, scale, 1.0)
            q = np.floor(flat / safe[owner] + 0.5)
            np.clip(q, -QUANT_MAX, QUANT_MAX, out=q)
            q[scale[owner] == 0] = 0.0
            q = q.astype(np.int64)
            sum_q = np.zeros(n, np.int64)
            np.add.at(sum_q, owner, q)
            sum_abs = np.zeros(n, np.int64)
            np.add.at(sum_abs, owner, np.abs(q))
            max_q = np.full(n, np.iinfo(np.int64).min)
            np.maximum.at(max_q, owner, q)
            min_q = np.full(n, np.iinfo(np.int64).max)
            np.minimum.at(min_q, owner, q)
            empty = lens == 0
            max_q[empty] = 0
            min_q[empty] = 0
            yield pa.RecordBatch.from_pydict({
                "id": ids,
                "n_dims": pa.array(lens, pa.int64()),
                "sum_q": pa.array(sum_q, pa.int64()),
                "sum_abs_q": pa.array(sum_abs, pa.int64()),
                "max_q": pa.array(max_q, pa.int64()),
                "min_q": pa.array(min_q, pa.int64()),
            })

    sel = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    out = sel.mapInArrow(
        kernel, "id long, n_dims long, sum_q long, sum_abs_q long, "
                "max_q long, min_q long")
    return out.withColumnRenamed("id", id_col)


def _quantize_cols(vec: "F.Column"):
    """array<double> → (q array<bigint>, qq bigint): symmetric int8
    quantization (same floor(x/scale+0.5) half-up arithmetic as
    quantize_embeddings_int8) plus the quantized self-dot, all as JVM
    higher-order functions — exactly reproducible in SQL."""
    scale = F.array_max(F.transform(vec, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.when(scale == 0, F.transform(vec, lambda x: F.lit(0).cast("long"))) \
         .otherwise(F.transform(
             vec, lambda x: F.least(
                 F.greatest(F.floor(x / scale + F.lit(0.5)), F.lit(-127.0)),
                 F.lit(127.0)).cast("long")))
    qq = F.aggregate(q, F.lit(0).cast("long"), lambda acc, v: acc + v * v)
    return q, qq


def quantized_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Two-stage retrieval over int8-quantized embeddings: rank candidates
    by QUANTIZED cosine (integer dot products — the 4×-less-memory-bandwidth
    scan a 100-TB vector corpus wants), then rescore the winners with the
    exact float cosine.  → (query_id, neighbor_id, sim_q8, exact_sim, rank).

    Determinism across engines: the quantized vectors are exact integers
    (identical half-up arithmetic), so the integer dot products, their
    IEEE sqrt/division, and the rank order (tie-broken by neighbor_id) are
    bit-reproducible — the whole two-stage pipeline hash-matches an
    identical-arithmetic SQL oracle, unlike float-sum scoring whose
    accumulation order varies.  Zero-norm vectors are excluded on both
    sides (no candidate to rank).  Plan shape matches brute_force_topk:
    broadcast query set, one corpus scan, window top-k — entirely
    whole-stage codegen, no Python."""
    base = emb.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("v"))
    q_arr, qq = _quantize_cols(F.col("v"))
    quant = base.select(F.col(id_col), "v", q_arr.alias("q"),
                        qq.alias("qq")).where(F.col("qq") > 0)
    qs = quant.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("query_v"),
        F.col("q").alias("query_q"), F.col("qq").alias("query_qq"))
    cand = quant.select(F.col(id_col).alias("neighbor_id"),
                        F.col("v").alias("cand_v"),
                        F.col("q").alias("cand_q"), F.col("qq").alias("cand_qq"))
    dot = F.aggregate(F.zip_with("query_q", "cand_q", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    simq = dot.cast("double") / (F.sqrt(F.col("query_qq").cast("double"))
                                 * F.sqrt(F.col("cand_qq").cast("double")))
    scored = (cand.crossJoin(F.broadcast(qs))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("simq_raw", simq))
    w = Window.partitionBy("query_id").orderBy(F.desc("simq_raw"),
                                               F.asc("neighbor_id"))
    topk = (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
    exact = _cosine(F.col("query_v"), F.col("cand_v"))
    return topk.select("query_id", "neighbor_id",
                       F.round("simq_raw", 6).alias("sim_q8"),
                       F.round(exact, 6).alias("exact_sim"),
                       F.col("rank").cast("int").alias("rank"))

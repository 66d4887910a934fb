"""Shared helpers for the pipeline function library."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, cap: int = 16) -> DataFrame:
    """Fan a narrow scan out to the cluster's parallelism.

    Small reference tables (the driver's 5k-doc / 2k-vector parquets) arrive
    as ONE row group, so every downstream Arrow kernel would run as a single
    task regardless of cores; a cheap raw-row shuffle (before any explode
    multiplies the data) restores parallelism.  At real scale the scan
    already has ≥ cap splits and this is a no-op.  Safe for every caller
    here: their kernels are per-row or merge per-key across partitions, so
    results are partitioning-invariant.
    """
    sc = df.sparkSession.sparkContext
    target = min(sc.defaultParallelism, cap)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

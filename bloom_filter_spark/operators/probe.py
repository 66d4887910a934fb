"""Broadcast probe operators — the Exist/estimate side of the lifecycle.

The final sketch blob is broadcast once; a scalar ``pandas_udf`` probes whole
Arrow batches through the numpy kernel.  Deserialization is cached per
executor process (keyed by broadcast id) so each task reuses the shared
state array instead of re-parsing the blob per batch — the distributed
analog of the reference's in-memory ``Exist`` loop
(/root/reference/filter/bloom/filter.go:49-61, main.go:39-52).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import BooleanType, DoubleType, LongType

from ..sketches.base import sketch_for_kind

_CACHE: dict[tuple, tuple] = {}


def _cache_key(blob: bytes, kind: str) -> tuple:
    # computed driver-side at UDF creation; stable across executors
    return (kind, len(blob), zlib.crc32(blob))


def _get(bc, key: tuple):
    hit = _CACHE.get(key)
    if hit is None:
        hit = sketch_for_kind(key[0]).deserialize(bytes(bc.value))
        if len(_CACHE) > 64:  # bound executor memory across many probes
            _CACHE.clear()
        _CACHE[key] = hit
    return hit


def membership_udf(spark: SparkSession, blob: bytes, kind: str, key_kind: str = "i32"):
    """→ pandas_udf(BooleanType): does the sketch contain each key?"""
    bc = spark.sparkContext.broadcast(blob)
    key = _cache_key(blob, kind)

    if key_kind == "i32":
        @F.pandas_udf(BooleanType())
        def probe(s: pd.Series) -> pd.Series:
            sk, state = _get(bc, key)
            return pd.Series(sk.contains_i32(state, s.to_numpy(np.int32, na_value=0)))
    elif key_kind == "str":
        @F.pandas_udf(BooleanType())
        def probe(s: pd.Series) -> pd.Series:
            sk, state = _get(bc, key)
            return pd.Series(sk.contains_str(state, s.fillna("").tolist()))
    else:
        raise ValueError(key_kind)
    return probe


def cms_point_udf(spark: SparkSession, blob: bytes, key_kind: str = "i32"):
    """→ pandas_udf(LongType): CMS frequency point estimate per key."""
    bc = spark.sparkContext.broadcast(blob)
    key = _cache_key(blob, "cms")

    if key_kind == "i32":
        @F.pandas_udf(LongType())
        def point(s: pd.Series) -> pd.Series:
            sk, state = _get(bc, key)
            return pd.Series(sk.point_i32(state, s.to_numpy(np.int32, na_value=0)))
    else:
        @F.pandas_udf(LongType())
        def point(s: pd.Series) -> pd.Series:
            sk, state = _get(bc, key)
            return pd.Series(sk.point_str(state, s.fillna("").tolist()))
    return point


def rank_udf(spark: SparkSession, blob: bytes, kind: str):
    """→ pandas_udf(DoubleType): estimated normalized rank (KLL / t-digest)."""
    bc = spark.sparkContext.broadcast(blob)
    key = _cache_key(blob, kind)

    @F.pandas_udf(DoubleType())
    def rank(s: pd.Series) -> pd.Series:
        sk, state = _get(bc, key)
        return pd.Series(sk.rank(state, s.to_numpy(np.float64)))

    return rank

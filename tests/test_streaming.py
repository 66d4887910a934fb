"""Streaming/batch equivalence: incremental foreachBatch sketch folds must
equal the one-shot batch build bit-for-bit (Bloom OR is associative over any
micro-batch partitioning), and watermarked window aggs must match the batch
groupBy(window) answer on bounded input."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloom_filter_spark.operators import build_sketch
from bloom_filter_spark.sketches import BloomParams, BloomSketch, HLLParams, HLLSketch
from bloom_filter_spark.streaming import streaming_sketch_build, windowed_event_counts


@pytest.fixture(scope="module")
def multi_file_tokens(spark, sf_small, tmp_path_factory):
    """Fixture tokens re-written as 4 files so the stream has 4 micro-batches."""
    out = str(tmp_path_factory.mktemp("stream_src") / "tokens")
    df = spark.read.parquet(f"{sf_small}/tokens.parquet")
    df.repartition(4).write.mode("overwrite").parquet(out)
    return out, df.schema


def test_streaming_bloom_equals_batch(spark, sf_small, multi_file_tokens):
    src, schema = multi_file_tokens
    sketch = BloomSketch(BloomParams(n=65_536, p=0.01))
    acc = streaming_sketch_build(spark, src, schema, sketch, "tokens", "i32_array")
    assert acc.epochs == 4
    batch_blob, batch_n = build_sketch(
        spark.read.parquet(src), sketch, "tokens", "i32_array")
    assert acc.n_items == batch_n
    assert acc.blob() == batch_blob  # bit-identical across any batch split


def test_streaming_hll_equals_batch(spark, multi_file_tokens):
    src, schema = multi_file_tokens
    sketch = HLLSketch(HLLParams(b=12))
    acc = streaming_sketch_build(spark, src, schema, sketch, "tokens", "i32_array")
    batch_blob, _ = build_sketch(spark.read.parquet(src), sketch, "tokens", "i32_array")
    assert acc.blob() == batch_blob


def test_windowed_event_counts_matches_batch(spark, tmp_path):
    import shutil
    src = "/root/testdata/sf0.001"
    stream_dir = tmp_path / "events"
    stream_dir.mkdir()
    shutil.copy(f"{src}/events.parquet", stream_dir / "events.parquet")
    ev = spark.read.parquet(f"{src}/events.parquet")
    got = windowed_event_counts(spark, str(stream_dir), ev.schema, "1 hour", "2 hours")
    exact = (ev.withColumn("ts_ltz", F.col("ts").cast("timestamp"))
             .groupBy(F.window("ts_ltz", "1 hour"), "event_type")
             .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
             .select(F.col("window.start").alias("window_start"),
                     "event_type", "n", "sum_value"))
    g = {tuple(r) for r in got.collect()}
    e = {tuple(r) for r in exact.collect()}
    assert g == e and len(g) > 0


def test_stateful_running_source_sketches(spark, multi_file_tokens):
    from pyspark.sql import functions as F

    from bloom_filter_spark.sketches import HLLParams, HLLSketch
    from bloom_filter_spark.streaming.stateful import running_source_sketches
    src, schema = multi_file_tokens
    got = {r.source: r for r in running_source_sketches(spark, src, schema, b=12).collect()}
    df = spark.read.parquet(src)
    exact = {r.source: r for r in
             df.select("source", F.explode("tokens").alias("t"))
             .groupBy("source").agg(F.countDistinct("t").alias("d")).collect()}
    docs = {r.source: r["count"] for r in df.groupBy("source").count().collect()}
    assert set(got) == set(exact)
    for s, row in got.items():
        assert row.n_docs == docs[s]
        assert abs(row.distinct_estimate - exact[s].d) <= 5 * (1.04 / 2**6) * exact[s].d

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


def test_append_mode_late_data_drop(spark):
    """Append-mode watermarked windows over the engineered 4-batch late
    stream: the emitted set and every count must equal the closed-form
    two-watermark model (lagged filter, current-wm eviction) that the
    DuckDB oracle implements — real eviction semantics, not complete-mode
    batch equivalence."""
    import duckdb

    from bloom_filter_spark.plans import pipeline_queries as pq
    got = sorted(tuple(r) for r in
                 pq.q_streaming_late_data_drop(spark, "/root/testdata/sf0.001")
                 .collect())
    want = sorted(duckdb.sql(
        pq._late_drop_sql("/root/testdata/sf0.001")).fetchall())
    assert got == want and len(got) == 12
    t0 = pq._LATE_T0
    emitted_windows = {ws for ws, *_ in got}
    # h4/h5 hold data but stay open at drain — never emitted
    assert emitted_windows == {t0, t0 + 3600, t0 + 7200, t0 + 10800}
    per_window = {}
    for ws, _, n, _ in got:
        per_window[ws - t0] = per_window.get(ws - t0, 0) + n
    # batch-3's 30 h0-rows and 20 h1-rows are hard-dropped (their windows
    # trail the lagged filter watermark); batch-2's same-shaped rows merge
    # into the eviction batch and ARE counted
    assert per_window == {0: 170, 3600: 160, 7200: 170, 10800: 195}


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


def test_streaming_changelog_retractions_equals_batch(spark, tmp_path):
    """Changelog stream (inserts then retraction files) folds to the same
    counting-bloom state as the one-shot batch fold, and retracted keys
    drop out while kept keys stay member."""
    from pyspark.sql import functions as F

    from bloom_filter_spark.operators import build_delta_sketch
    from bloom_filter_spark.sketches import BloomParams, CountingBloomSketch
    from bloom_filter_spark.streaming import streaming_delta_build

    cb = CountingBloomSketch(BloomParams(n=2000, p=0.01))
    ids = spark.range(1000).select(
        F.concat(F.lit("doc_"), F.col("id")).alias("doc_id"),
        (F.col("id") % 2 == 1).alias("odd"))
    src = str(tmp_path / "changelog")
    (ids.select("doc_id", F.lit(1).alias("sign"))
     .repartition(2).write.mode("overwrite").parquet(src))
    (ids.where("odd").select("doc_id", F.lit(-1).alias("sign"))
     .repartition(1).write.mode("append").parquet(src))
    changelog = spark.read.parquet(src)
    acc = streaming_delta_build(spark, src, changelog.schema, cb,
                                "doc_id", "sign", "str")
    batch_blob, _ = build_delta_sketch(changelog, cb, "doc_id", "sign", "str")
    assert acc.blob() == batch_blob  # commutative fold: order-independent
    assert acc.epochs == 3
    cb2, state = CountingBloomSketch.deserialize(acc.blob())
    kept = [r.doc_id for r in ids.where("NOT odd").collect()]
    gone = [r.doc_id for r in ids.where("odd").collect()]
    assert (state >= 0).all()
    assert cb2.contains_str(state, kept).all()
    assert cb2.contains_str(state, gone).mean() <= 0.05


def test_streaming_grouped_hll_equals_batch(spark, multi_file_tokens):
    """Per-GROUP streaming fold (GroupedStreamAccumulator): folding a
    4-file stream per micro-batch must produce per-source HLL states
    bit-equal to one batch grouped build (register-max commutes), with
    per-group n_items preserved."""
    from bloom_filter_spark.operators import build_grouped
    from bloom_filter_spark.streaming.stream_build import (
        GroupedStreamAccumulator, _run_stream_fold)
    src, schema = multi_file_tokens
    sketch = HLLSketch(HLLParams(b=12))

    def prep(df):
        return df.select(F.col("source").alias("group"),
                         F.col("tokens").alias("v"))

    acc = _run_stream_fold(
        spark, src, schema,
        GroupedStreamAccumulator(sketch, prep, "i32_array"), 1)
    assert acc.epochs == 4
    batch = {r.group: (int(r.n_items), bytes(r.state)) for r in build_grouped(
        prep(spark.read.parquet(src)), sketch, "group", "v", "i32_array",
        strategy="mapside").collect()}
    got = {g: (acc.n_items[g], b) for g, b in acc.blobs().items()}
    assert got == batch and len(batch) > 1


def test_streaming_exact_dedup_equals_batch_any_split(spark, tmp_path):
    """Streaming dedup fold == one-shot batch exact_dedup under any
    micro-batch split (the (count-sum, min-keeper) monoid commutes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bloom_filter_spark.functions.dedup import exact_dedup
    from bloom_filter_spark.streaming.stream_build import streaming_exact_dedup
    texts = ["alpha", "beta", "alpha", "gamma", "beta", "alpha", "delta"]
    rows = [(i, t) for i, t in enumerate(texts)]
    src = tmp_path / "docs"
    src.mkdir()
    for i in range(3):
        sl = rows[i * 3:(i + 1) * 3]
        if sl:
            pq.write_table(pa.table({"doc_id": [r[0] for r in sl],
                                     "text": [r[1] for r in sl]}),
                           str(src / f"p{i}.parquet"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {(r.text_hash, r.n_copies, r.keep_doc_id)
            for r in exact_dedup(df).collect()}
    schema = df.schema
    for mfpt in (1, 2):
        got = {(r.text_hash, r.n_copies, r.keep_doc_id)
               for r in streaming_exact_dedup(
                   spark, str(src), schema,
                   max_files_per_trigger=mfpt).collect()}
        assert got == want, mfpt
    assert len(want) == 4  # alpha x3, beta x2, gamma, delta


def test_streaming_exact_dedup_null_ids(spark, tmp_path):
    """All-NULL-id duplicate content across micro-batches must fold
    null-safely (Spark F.min skips nulls; the accumulator must too)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bloom_filter_spark.streaming.stream_build import streaming_exact_dedup
    src = tmp_path / "nulldocs"
    src.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([None, 7], pa.int64()),
                             "text": ["same", "same"]}),
                   str(src / "p0.parquet"))
    pq.write_table(pa.table({"doc_id": pa.array([None], pa.int64()),
                             "text": ["same"]}),
                   str(src / "p1.parquet"))
    schema = spark.read.parquet(str(src)).schema
    got = streaming_exact_dedup(spark, str(src), schema).collect()
    assert len(got) == 1 and got[0].n_copies == 3 and got[0].keep_doc_id == 7

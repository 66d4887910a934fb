"""Benchmark harness — prints ONE JSON line per run.

Headline metric (BASELINE.json): tokens/sec sketch-build throughput +
measured Bloom FPR vs configured p.  Queries cover every sketch build, the
probe path, the salted grouped build, and two pipeline ops.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
tools/run_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from bloom_filter_spark.operators import (
        build_grouped, build_sketch, membership_udf)
    from bloom_filter_spark.session import get_spark
    from bloom_filter_spark.sketches import (
        BloomParams, BloomSketch, CMSParams, CMSSketch, HLLParams, HLLSketch,
        KLLParams, KLLSketch, TDigestParams, TDigestSketch)
    from bloom_filter_spark.sources.fixtures import (
        ensure_fixtures, sf_name_of_dir)

    sf_name = sf_name_of_dir(sf_dir)
    fx = ensure_fixtures(sf_name)  # one-time, outside the timed region

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    tokens = spark.read.parquet(f"{fx}/tokens.parquet")
    n_tokens = tokens.select(F.sum("n_tok")).collect()[0][0]
    # warm the page cache for the COLUMN the builds actually read (n_tok
    # alone leaves tokens cold — the first timed build would pay the cold
    # parquet scan) and start Python workers + import numpy in each
    tokens.select(F.sum(F.size("tokens"))).collect()
    build_sketch(tokens.limit(2000), BloomSketch(BloomParams(n=1024, p=0.01)),
                 "tokens", "i32_array", repartition=cpus)

    results: dict[str, float] = {}
    extra: dict[str, float] = {}
    samples: dict[str, list[float]] = {}

    def timed(name: str, fn, repeats: int = 1):
        out = None
        obs = []
        for _ in range(repeats):
            t0 = time.time()
            out = fn()
            obs.append(round(time.time() - t0, 3))
        # best-of is the reported line (least contention-polluted), but the
        # raw samples ride along so a reader can separate throttle noise
        # from real regression without re-litigating (VERDICT r5 #9)
        samples[name] = obs
        results[name] = min(obs)
        return out

    # repeats=3 on the headline line: the host throttles in multi-second
    # windows (identical binaries measured 1.8-6.3 s across sessions);
    # best-of-3 samples more windows for ~4 s extra suite cost
    bloom = BloomSketch(BloomParams(n=65_536, p=0.01))
    blob, n_built = timed(
        "bloom_build", lambda: build_sketch(tokens, bloom, "tokens", "i32_array"),
        repeats=3)
    assert n_built == n_tokens
    extra["bloom_build_tokens_per_sec"] = round(n_tokens / results["bloom_build"], 0)

    def probe_all():
        probe = membership_udf(spark, blob, "bloom", "i32")
        pres = spark.read.parquet(f"{fx}/probes_present.parquet")
        abst = spark.read.parquet(f"{fx}/probes_absent.parquet")
        fn_cnt = pres.where(~probe(F.col("token"))).count()
        fp_cnt = abst.where(probe(F.col("token"))).count()
        return fn_cnt, fp_cnt

    fn_cnt, fp_cnt = timed("bloom_probe_20k", probe_all, repeats=2)
    extra["bloom_false_negatives"] = fn_cnt
    extra["bloom_measured_fpr"] = fp_cnt / 10_000
    extra["bloom_configured_p"] = 0.01

    def probe_full_stream():
        # membership of EVERY ingested token — the Exist() hot loop at scale
        from bloom_filter_spark.operators import membership_scan
        agg = (membership_scan(tokens, "tokens", spark, blob, "bloom")
               .agg(F.sum("n_probed").alias("n"), F.sum("n_member").alias("hits"))
               .collect()[0])
        assert agg.n == n_tokens and agg.hits == n_tokens  # zero FN, full stream
        return agg.hits

    timed("bloom_probe_full_stream", probe_full_stream, repeats=2)
    extra["bloom_probe_tokens_per_sec"] = round(
        n_tokens / results["bloom_probe_full_stream"], 0)

    timed("hll_build", lambda: build_sketch(
        tokens, HLLSketch(HLLParams(b=14)), "tokens", "i32_array"), repeats=2)
    timed("cms_build", lambda: build_sketch(
        tokens, CMSSketch(CMSParams(eps=0.0001, delta=0.001)), "tokens", "i32_array"),
        repeats=2)
    from bloom_filter_spark.sketches import CountSketch, CountSketchParams
    timed("countsketch_build", lambda: build_sketch(
        tokens, CountSketch(CountSketchParams(w=1 << 15, d=5)),
        "tokens", "i32_array"), repeats=2)
    timed("kll_build_tokens", lambda: build_sketch(
        tokens, KLLSketch(KLLParams(k=200)), "tokens", "i32_array"), repeats=2)
    timed("tdigest_build_ntok", lambda: build_sketch(
        tokens, TDigestSketch(TDigestParams(200)), "n_tok", "f64"), repeats=2)
    from bloom_filter_spark.sketches import DDSketch, DDSketchParams
    timed("ddsketch_build_ntok", lambda: build_sketch(
        tokens, DDSketch(DDSketchParams(alpha=0.01)), "n_tok", "f64"),
        repeats=2)
    from bloom_filter_spark.operators import build_sketch_preagg
    timed("bloom_build_preagg", lambda: build_sketch_preagg(
        tokens, BloomSketch(BloomParams(n=65_536, p=0.01)), "tokens", "i32_array"),
        repeats=2)
    # map-side combine (default strategy): the token data never shuffles —
    # shuffle volume is P × G states, input-size-independent.  The salted
    # repartition strategy (full-data shuffle, for huge group domains) is
    # timed separately so both paths stay visible round-over-round;
    # BENCH/AB_grouped.json carries the interleaved A/B that attributed the
    # r2 driver regression on the salted path.
    # strategy pinned so the timed plan stays the map-side combine itself;
    # the auto router's cardinality-estimate job is planning-time work
    # (exercised under the driver correctness gate instead)
    timed("hll_grouped_by_source", lambda: build_grouped(
        tokens, HLLSketch(HLLParams(b=12)), "source", "tokens",
        "i32_array", strategy="mapside").collect(), repeats=2)
    timed("hll_grouped_by_source_salted", lambda: build_grouped(
        tokens, HLLSketch(HLLParams(b=12)), "source", "tokens", "i32_array",
        n_salts=cpus, salt_on="doc_id", strategy="salted").collect(), repeats=2)

    # distributed deletes: ±1 changelog fold (inserts + odd-parity
    # retractions) — counter-sum merge.  Benched on a deterministic 1/3
    # doc subset (keeps every delete's insert).  At sf0.1 the subset's
    # ~8 MB states ride the driver-fold merge; above the 32 MB route
    # threshold build_delta_sketch auto-shards the state into column-range
    # (shard_id, state) rows merged by ONE groupBy(shard_id) wave —
    # sf1 evidence in BENCH/cbloom_sharded_sf1.json (143.6 s → 5.8 s).
    from bloom_filter_spark.operators import build_delta_sketch
    from bloom_filter_spark.plans.queries import _parity_changelog
    from bloom_filter_spark.sketches import CountingBloomSketch
    _, changelog, cb_full = _parity_changelog(spark, sf_dir)
    changelog_sub = changelog.where(F.crc32(F.col("doc_id")) % 3 == 0)
    cb = CountingBloomSketch(BloomParams(n=cb_full.params.n // 3 + 16,
                                         p=0.01))
    timed("cbloom_changelog_build", lambda: build_delta_sketch(
        changelog_sub, cb, "doc_id", "sign", "str")[1], repeats=2)

    # str-keyed build + full-stream probe (doc-id shaped): exercises the
    # zero-copy Arrow string path (core/hashing.py::StrBuf) — UTF-8 keys
    # hash straight off the Arrow offsets/values buffers, no Python string
    # objects on the hot path.  Kernel-level interleaved A/B vs the
    # to_pylist path it replaced: BENCH/AB_strbuf.json (build 3.3×,
    # probe 12.0× best-of-5).  Ids generate in-plan (no scan, no shuffle:
    # the timed region is the hash+fold+merge itself).
    # capped at 4M keys: the line times the STRING hot path (hash + fold +
    # merge at a fixed 2^26-bit / 8.4 MB filter) — uncapped, sf0.1's 38M
    # ids turn it into a wide-state fold stress test that belongs to the
    # cbloom sharded evidence, not this line
    n_ids = min(max(int(n_tokens // 4), 100_000), 4_000_000)
    doc_ids = spark.range(n_ids).select(
        F.concat(F.lit("doc_"), F.lpad(F.col("id").cast("string"), 9, "0"))
         .alias("doc_id"))
    bloom_doc = BloomSketch(BloomParams(n=n_ids, p=0.01))
    doc_blob, n_doc = timed("bloom_doc_build_str", lambda: build_sketch(
        doc_ids, bloom_doc, "doc_id", "str"), repeats=2)
    assert n_doc == n_ids
    extra["bloom_doc_build_keys_per_sec"] = round(
        n_ids / results["bloom_doc_build_str"], 0)

    def probe_doc_stream():
        from bloom_filter_spark.operators import membership_scan
        agg = (membership_scan(doc_ids, "doc_id", spark, doc_blob, "bloom",
                               value_kind="str")
               .agg(F.sum("n_probed").alias("n"),
                    F.sum("n_member").alias("hits")).collect()[0])
        assert agg.n == n_ids and agg.hits == n_ids  # zero FN
        return agg.hits

    timed("bloom_doc_probe_stream_str", probe_doc_stream, repeats=2)
    extra["bloom_doc_probe_keys_per_sec"] = round(
        n_ids / results["bloom_doc_probe_stream_str"], 0)

    # pipeline ops on the driver testdata (documents/embeddings); above
    # sf0.1 the driver ships no doc/emb tables, so the deterministic
    # fixture twins stand in (same schema and workload shape)
    docs_dir = sf_dir
    if not os.path.exists(f"{docs_dir}/documents.parquet"):
        from bloom_filter_spark.sources.fixtures import ensure_doc_fixtures
        docs_dir = ensure_doc_fixtures(sf_name)
    if os.path.exists(f"{docs_dir}/documents.parquet"):
        from bloom_filter_spark.functions import dedup, similarity
        docs = spark.read.parquet(f"{docs_dir}/documents.parquet")
        # repeats=2 on the historically noisiest lines: identical binaries
        # measured up to 6.7x apart in one session on this host
        # (BENCH/AB_grouped.json); best-of-2 keeps round-over-round
        # comparisons about the code, not the hypervisor
        timed("dedup_minhash_lsh", lambda: dedup.minhash_lsh_pairs(
            docs, threshold=0.5).count(), repeats=2)
        emb = spark.read.parquet(f"{docs_dir}/embeddings.parquet")
        timed("embedding_cosine_topk", lambda: similarity.brute_force_topk(
            emb, list(range(10)), k=5).count(), repeats=2)
        # scale-regime parameters (τ=0.85 near-dup, 16-bit tables): the
        # config where blocking beats all-pairs by ~2^16/table.  The
        # driver-correctness config (4-bit × 64 tables, τ=0.45 — exact
        # recall at the fixture's threshold) is verified in CORRECTNESS;
        # at τ that low LSH candidates approach all-pairs by construction,
        # so timing it would measure the fixture, not the operator.
        timed("embedding_lsh_neardup", lambda: similarity.lsh_neardup_pairs(
            emb, threshold=0.85, n_bits=16, n_tables=8).count(), repeats=2)
        timed("embedding_ivf_topk", lambda: similarity.ivf_topk(
            emb, list(range(10)), k=5, n_lists=16, n_probe=4).count(),
            repeats=2)
        timed("dedup_simhash", lambda: dedup.simhash_pairs(
            docs, max_hamming=7).count(), repeats=2)
        from bloom_filter_spark.functions import sampling
        timed("weighted_sample_topk", lambda: sampling.weighted_sample_topk(
            docs, "doc_id", "n_chars", k=100).count(), repeats=2)
        # decontamination: broadcast Bloom prefilter + exact confirm join
        timed("text_contamination", lambda: dedup.contamination_check(
            docs.where(F.col("doc_id") % 10 != 0),
            docs.where(F.col("doc_id") % 10 == 0)).count(), repeats=2)

    # temporal joins over the driver's events table (absent above sf0.1)
    if os.path.exists(f"{sf_dir}/events.parquet"):
        from bloom_filter_spark.functions.joins import asof_join, range_join
        from bloom_filter_spark.plans.pipeline_queries import (
            ERR_WINDOW_US, event_projections)
        purch, clicks, errors = event_projections(spark, sf_dir)
        timed("events_asof_join", lambda: asof_join(
            purch, clicks, key="user_id", left_ts="purchase_ts",
            right_ts="ts_us", right_cols=["click_id", "click_value"],
            tie_col="click_id").count(), repeats=2)
        timed("events_range_join", lambda: range_join(
            clicks.select("user_id", "click_id",
                          F.col("ts_us").alias("click_ts")),
            errors, key="user_id", point_ts="click_ts",
            start_ts="err_start", end_ts="err_end",
            bucket=ERR_WINDOW_US).count(), repeats=2)

    total = round(sum(results.values()), 3)
    build_secs = sum(results[k] for k in
                     ("bloom_build", "hll_build", "cms_build", "kll_build_tokens"))
    extra["sketch_build_tokens_per_sec_aggregate"] = round(4 * n_tokens / build_secs, 0)
    extra["n_tokens"] = int(n_tokens)
    extra["cpus"] = cpus

    print(json.dumps({
        "metric": "sketch-suite wall-clock (build+probe+grouped+pipeline)",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf_name.removeprefix("sf"),
        "samples": samples,
        **extra,
    }))


if __name__ == "__main__":
    main()

"""End-to-end distributed sketch lifecycle on Spark (SURVEY.md §3.1 M1):
scan → mapInPandas partial build → applyInPandas merge tree → broadcast
probe — the reference's main.go workload, distributed.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloom_filter_spark.operators import (
    SketchCheckpoint, build_grouped, build_grouped_single_writer, build_partials,
    build_sketch, cms_point_udf, membership_udf, merge_partials_tree,
)
from bloom_filter_spark.sketches import (
    BloomParams, BloomSketch, CMSParams, CMSSketch, CuckooParams,
    HLLParams, HLLSketch, KLLParams, KLLSketch, TDigestParams, TDigestSketch,
)


@pytest.fixture(scope="module")
def tokens_df(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/tokens.parquet")


@pytest.fixture(scope="module")
def bloom_blob(spark, tokens_df):
    sketch = BloomSketch(BloomParams(n=60_000, p=0.01))
    blob, n = build_sketch(tokens_df, sketch, "tokens", "i32_array", repartition=8)
    assert n == tokens_df.select(F.sum("n_tok")).collect()[0][0]
    return sketch, blob


def test_bloom_e2e_zero_fn(spark, sf_small, bloom_blob):
    # every inserted token must probe true (main.go:39-43 invariant)
    sketch, blob = bloom_blob
    present = spark.read.parquet(f"{sf_small}/probes_present.parquet")
    probe = membership_udf(spark, blob, "bloom", "i32")
    res = present.select(probe(F.col("token")).alias("member"))
    assert res.where(~F.col("member")).count() == 0


def test_bloom_e2e_fpr(spark, sf_small, bloom_blob):
    sketch, blob = bloom_blob
    absent = spark.read.parquet(f"{sf_small}/probes_absent.parquet")
    probe = membership_udf(spark, blob, "bloom", "i32")
    fp = absent.select(probe(F.col("token")).alias("m")).where("m").count()
    assert fp / 10_000 <= sketch.params.p


def test_distributed_equals_local(spark, tokens_df, bloom_blob):
    # the distributed OR-merge must equal a single-process build bit-for-bit
    sketch, blob = bloom_blob
    local_state = sketch.empty()
    pdf = tokens_df.select("tokens").toPandas()
    flat = np.concatenate([a for a in pdf["tokens"].to_numpy() if len(a)]).astype(np.int32)
    sketch.update_i32(local_state, flat)
    assert sketch.serialize(local_state) == blob


def test_merge_tree_multilevel(spark, tokens_df):
    # force a 3-level tree (fanin 4 over 32 partitions) — same result
    sketch = BloomSketch(BloomParams(n=60_000, p=0.01))
    partials = build_partials(tokens_df, sketch, "tokens", "i32_array", repartition=32)
    row = merge_partials_tree(partials, sketch, fanin=4).collect()[0]
    blob, _ = build_sketch(tokens_df, sketch, "tokens", "i32_array", repartition=8)
    assert bytes(row.state) == blob


def test_merge_auto_routes_by_state_volume(spark, tokens_df):
    """The router must pick the executor tree when P x |state| exceeds the
    threshold and the driver fold otherwise — byte-identical results."""
    from bloom_filter_spark.operators.merge import (
        merge_partials_auto, merge_partials_collect, state_size_estimate)
    sketch = BloomSketch(BloomParams(n=60_000, p=0.01))
    partials = build_partials(tokens_df, sketch, "tokens", "i32_array",
                              repartition=16).cache()
    collect_blob, n1 = merge_partials_collect(partials, sketch)
    # threshold 0 forces the tree path (any P x |state| exceeds it)
    tree_blob, n2 = merge_partials_auto(partials, sketch, fanin=4,
                                        threshold_bytes=0)
    # huge threshold forces the driver fold
    fold_blob, n3 = merge_partials_auto(partials, sketch,
                                        threshold_bytes=1 << 60)
    partials.unpersist()
    assert collect_blob == tree_blob == fold_blob
    assert n1 == n2 == n3
    assert state_size_estimate(sketch) > 0


def test_hll_distributed_estimate(spark, tokens_df):
    sketch = HLLSketch(HLLParams(b=14))
    blob, n = build_sketch(tokens_df, sketch, "tokens", "i32_array")
    _, state = HLLSketch.deserialize(blob)
    est = sketch.estimate(state)
    exact = (tokens_df.select(F.explode("tokens").alias("t"))
             .agg(F.countDistinct("t")).collect()[0][0])
    assert abs(est - exact) / exact <= 4 * sketch.params.std_error


def test_cms_distributed_point_queries(spark, tokens_df):
    sketch = CMSSketch(CMSParams(eps=0.0001, delta=0.001))
    blob, n = build_sketch(tokens_df, sketch, "tokens", "i32_array")
    exact = (tokens_df.select(F.explode("tokens").alias("t"))
             .groupBy("t").count().orderBy(F.desc("count")).limit(50))
    point = cms_point_udf(spark, blob, "i32")
    got = exact.withColumn("est", point(F.col("t"))).collect()
    for r in got:
        assert r.est >= r["count"]                 # never underestimates
        assert r.est - r["count"] <= sketch.params.eps * n


def test_countsketch_distributed_build_matches_local(spark, tokens_df):
    """Distributed build ≡ single-process build bit-for-bit (counter-sum is
    order-invariant), and the unbiased point estimates honor the F2 bound."""
    from bloom_filter_spark.sketches import CountSketch, CountSketchParams
    sketch = CountSketch(CountSketchParams(w=1 << 14, d=5))
    blob, n = build_sketch(tokens_df, sketch, "tokens", "i32_array",
                           repartition=8)
    rows = tokens_df.select("tokens").collect()
    local = sketch.empty()
    sketch.update_i32(local, np.concatenate(
        [np.asarray(r.tokens, np.int32) for r in rows]))
    _, dist = CountSketch.deserialize(blob)
    assert np.array_equal(dist, local)
    counts = (tokens_df.select(F.explode("tokens").alias("t"))
              .groupBy("t").count().collect())
    c = np.array([r["count"] for r in counts], dtype=np.float64)
    f2 = float((c ** 2).sum())
    point = cms_point_udf(spark, blob, "i32", kind="countsketch")
    top = (tokens_df.select(F.explode("tokens").alias("t"))
           .groupBy("t").count().orderBy(F.desc("count")).limit(50)
           .withColumn("est", point(F.col("t"))).collect())
    bound = 6 * np.sqrt(f2 / sketch.params.w)
    errs = np.array([r.est - r["count"] for r in top], dtype=np.float64)
    assert np.abs(errs).max() <= bound
    assert abs(sketch.f2_estimate(dist) - f2) <= 6 * f2 * np.sqrt(2 / sketch.params.w)


def test_kll_tdigest_distributed_quantiles(spark, tokens_df):
    exact_ntok = np.sort(np.array(
        tokens_df.select("n_tok").toPandas()["n_tok"], dtype=np.float64))
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    for sketch in (KLLSketch(KLLParams(k=200)), TDigestSketch(TDigestParams(200))):
        blob, n = build_sketch(tokens_df, sketch, "n_tok", "f64")
        assert n == exact_ntok.size
        _, state = type(sketch).deserialize(blob)
        est = sketch.quantiles(state, qs)
        ranks = np.searchsorted(exact_ntok, est, side="right") / exact_ntok.size
        bound = sketch.params.rank_error * 1.5 if hasattr(sketch.params, "rank_error") else 0.02
        assert np.abs(ranks - np.array(qs)).max() <= bound


def test_grouped_build_salted(spark, tokens_df):
    # per-source HLL with salt fan-out; estimates match per-source exact counts
    sketch = HLLSketch(HLLParams(b=12))
    grouped = build_grouped(tokens_df, sketch, "source", "tokens",
                            "i32_array", n_salts=8, salt_on="doc_id",
                            strategy="salted").collect()
    exact = {r.source: r.cnt for r in
             tokens_df.select("source", F.explode("tokens").alias("t"))
             .groupBy("source").agg(F.countDistinct("t").alias("cnt")).collect()}
    assert len(grouped) == len(exact)
    for row in grouped:
        _, state = HLLSketch.deserialize(bytes(row.state))
        est = sketch.estimate(state)
        assert abs(est - exact[row.group]) / exact[row.group] <= 5 * sketch.params.std_error


def test_cuckoo_grouped_single_writer(spark, tokens_df):
    res = build_grouped_single_writer(
        tokens_df, "cuckoo", CuckooParams(n=30_000, load_factor=0.8),
        "source", "doc_id", "str").collect()
    assert sum(r.n_failed for r in res) == 0
    from bloom_filter_spark.sketches import CuckooFilter
    by_group = {r.group: bytes(r.state) for r in res}
    docs = tokens_df.where(F.col("source") == "src_00").select("doc_id").toPandas()
    cf, state = CuckooFilter.deserialize(by_group["src_00"])
    assert cf.contains_str(state, docs["doc_id"].tolist()).all()


def test_checkpoint_resume(spark, tokens_df, tmp_path, bloom_blob):
    sketch, direct_blob = bloom_blob
    ck = SketchCheckpoint(str(tmp_path / "ckpt"))
    blob, n = build_sketch(tokens_df, sketch, "tokens", "i32_array",
                           repartition=8, checkpoint=ck, sketch_id="bloom_t1")
    assert blob == direct_blob
    # resume from persisted partials only — must equal the direct build
    blob2, n2 = ck.resume(spark, "bloom_t1", sketch)
    assert blob2 == direct_blob and n2 == n
    # and the stored final is readable
    blob3, _ = ck.read_final(spark, "bloom_t1")
    assert blob3 == direct_blob


def test_mismatched_params_merge_refused(spark, tokens_df):
    a = build_partials(tokens_df.limit(100), BloomSketch(BloomParams(n=1000, p=0.01)),
                       "tokens", "i32_array", repartition=1)
    b = build_partials(tokens_df.limit(100), BloomSketch(BloomParams(n=1000, p=0.02)),
                       "tokens", "i32_array", repartition=1)
    both = a.union(b)
    with pytest.raises(Exception, match="different params|PythonException|refusing"):
        merge_partials_tree(both, BloomSketch(BloomParams(n=1000, p=0.01))).collect()


def test_grouped_paths_produce_identical_states(spark, tokens_df):
    """Salted, map-side, and JVM-preagg grouped builds are bit-identical
    (HLL register-max merge is order-insensitive, so every strategy must
    land on the same registers)."""
    from bloom_filter_spark.operators import build_grouped_preagg
    sk = HLLSketch(HLLParams(b=12))
    a = {r.group: bytes(r.state) for r in build_grouped(
        tokens_df, sk, "source", "tokens", "i32_array",
        n_salts=8, salt_on="doc_id", strategy="salted").collect()}
    b = {r.group: bytes(r.state) for r in build_grouped_preagg(
        tokens_df, sk, "source", "tokens").collect()}
    c = {r.group: bytes(r.state) for r in build_grouped(
        tokens_df, sk, "source", "tokens", "i32_array",
        strategy="mapside").collect()}
    assert a == b == c
    ns = {r.group: r.n_items for r in build_grouped(
        tokens_df, sk, "source", "tokens", "i32_array",
        strategy="mapside").collect()}
    exact_n = {r.source: r.n for r in
               tokens_df.groupBy("source").agg(F.sum("n_tok").alias("n")).collect()}
    assert ns == exact_n


def test_preagg_direct_identical_cms(spark, tokens_df):
    from bloom_filter_spark.operators import build_sketch_preagg
    sk = CMSSketch(CMSParams(eps=0.001, delta=0.01))
    direct, n1 = build_sketch(tokens_df, sk, "tokens", "i32_array")
    pre, n2 = build_sketch_preagg(tokens_df, sk, "tokens", "i32_array")
    assert direct == pre and n1 == n2


def test_register_sql_probes(spark, sf_small, bloom_blob):
    from bloom_filter_spark.operators.probe import register_sql_probes
    sketch, blob = bloom_blob
    register_sql_probes(spark, "tok", blob, "bloom", "i32")
    spark.read.parquet(f"{sf_small}/probes_present.parquet") \
         .createOrReplaceTempView("probes_v")
    n = spark.sql("SELECT count(*) c FROM probes_v WHERE NOT tok_contains(token)") \
             .collect()[0].c
    assert n == 0  # zero FN through the SQL surface


def test_membership_scan_scalar_and_str(spark, sf_small, bloom_blob):
    from bloom_filter_spark.operators import membership_scan
    sketch, blob = bloom_blob
    pres = spark.read.parquet(f"{sf_small}/probes_present.parquet")
    agg = (membership_scan(pres, "token", spark, blob, "bloom", "i32")
           .agg(F.sum("n_probed").alias("n"), F.sum("n_member").alias("h"))
           .collect()[0])
    assert agg.n == agg.h == 10_000
    # string scan over doc ids with a doc-keyed bloom
    from bloom_filter_spark.sketches import BloomParams, BloomSketch
    toks = spark.read.parquet(f"{sf_small}/tokens.parquet")
    dblob, _ = build_sketch(toks, BloomSketch(BloomParams(n=10_000, p=0.01)),
                            "doc_id", "str")
    agg2 = (membership_scan(toks, "doc_id", spark, dblob, "bloom", "str")
            .agg(F.sum("n_probed").alias("n"), F.sum("n_member").alias("h"))
            .collect()[0])
    assert agg2.n == agg2.h  # zero FN over every doc id


def test_reservoir_distributed_build(spark, tokens_df):
    from bloom_filter_spark.sketches import ReservoirParams, ReservoirSketch
    sk = ReservoirSketch(ReservoirParams(k=500, seed=7))
    blob, n = build_sketch(tokens_df, sk, "tokens", "i32_array")
    assert n == tokens_df.select(F.sum("n_tok")).collect()[0][0]
    _, state = ReservoirSketch.deserialize(blob)
    assert state.n == n and state.sample.size == 500
    present = set(r.t for r in tokens_df.select(
        F.explode("tokens").alias("t")).distinct().collect())
    assert set(state.sample.tolist()) <= present


def test_counting_bloom_changelog_fold(spark, tokens_df):
    """Distributed insert/delete changelog: deletes land on DIFFERENT
    partitions than their inserts (repartition by sign), so partials go
    locally negative and only the counter-sum merge restores the global
    multiset — the property that makes deletes union-mergeable."""
    from bloom_filter_spark.operators import build_delta_sketch
    from bloom_filter_spark.sketches import BloomParams, CountingBloomSketch

    cb = CountingBloomSketch(BloomParams(n=10_000, p=0.01))
    docs = tokens_df.select("doc_id")
    parity = (F.ascii(F.substring("doc_id", -1, 1)) % 2).alias("par")
    with_par = docs.select("doc_id", parity)
    changelog = (with_par.select("doc_id", F.lit(1).alias("sign"))
                 .unionAll(with_par.where(F.col("par") == 1)
                           .select("doc_id", F.lit(-1).alias("sign"))))
    # repartition by sign: every delete is folded apart from its insert
    blob, n = build_delta_sketch(changelog.repartition(8, "sign"),
                                 cb, "doc_id", "sign", "str")
    cb2, state = CountingBloomSketch.deserialize(blob)
    assert (state >= 0).all()  # discipline held globally
    kept = [r.doc_id for r in with_par.where(F.col("par") == 0).collect()]
    dele = [r.doc_id for r in with_par.where(F.col("par") == 1).collect()]
    assert cb2.contains_str(state, kept).all()  # zero FN on survivors
    assert cb2.contains_str(state, dele).mean() <= 0.05
    assert n == len(kept) + 2 * len(dele)


def test_changelog_checkpoint_resume(spark, tokens_df, tmp_path):
    """Changelog (±1) partials persist through the checkpoint table and
    resume to the SAME state bit-for-bit — resumable distributed deletes."""
    from bloom_filter_spark.operators import (SketchCheckpoint,
                                              build_delta_partials,
                                              build_delta_sketch)
    from bloom_filter_spark.sketches import BloomParams, CountingBloomSketch

    cb = CountingBloomSketch(BloomParams(n=10_000, p=0.01))
    docs = tokens_df.select("doc_id")
    parity = (F.ascii(F.substring("doc_id", -1, 1)) % 2).alias("par")
    with_par = docs.select("doc_id", parity)
    changelog = (with_par.select("doc_id", F.lit(1).alias("sign"))
                 .unionAll(with_par.where(F.col("par") == 1)
                           .select("doc_id", F.lit(-1).alias("sign"))))
    direct_blob, _ = build_delta_sketch(changelog, cb, "doc_id", "sign", "str")

    ck = SketchCheckpoint(str(tmp_path / "ckpt"))
    partials = build_delta_partials(changelog, cb, "doc_id", "sign", "str")
    # write_partials persists eagerly; the returned read-back is unused here
    ck.write_partials("cbloom_log", cb, partials)
    blob, _n = ck.resume(spark, "cbloom_log", cb)
    assert blob == direct_blob  # resume-from-checkpoint ≡ direct fold


def test_bucketed_tables_join_without_exchange(spark, tokens_df):
    """Co-located join via bucketing: two tables bucketed by the join key
    into the same bucket count sort-merge-join with NO Exchange on either
    side — the pre-shuffle trade a 100 TB deployment makes once at write
    time and amortizes over every subsequent join."""
    import uuid
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    a, b = f"docs_a_{uuid.uuid4().hex[:8]}", f"docs_b_{uuid.uuid4().hex[:8]}"
    try:
        # at test scale the planner would broadcast (and skip bucketing);
        # the 100 TB regime this demonstrates is the non-broadcastable SMJ.
        # conf mutation + writes sit INSIDE try so a failure can't leak the
        # disabled-broadcast setting into the shared session fixture
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = tokens_df.select("doc_id", "n_tok")
        right = tokens_df.select("doc_id", "source")
        (left.write.bucketBy(8, "doc_id").sortBy("doc_id")
         .mode("overwrite").saveAsTable(a))
        (right.write.bucketBy(8, "doc_id").sortBy("doc_id")
         .mode("overwrite").saveAsTable(b))
        joined = spark.table(a).join(spark.table(b), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides pre-bucketed: no shuffle
        assert joined.count() == tokens_df.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {a}")
        spark.sql(f"DROP TABLE IF EXISTS {b}")


def test_wide_state_fold_auto_coalesces(spark, tokens_df):
    """P × |state| bounding: a wide-state (multi-MB) sketch fold coalesces
    its input so the merge never receives GBs of partials; narrow sketches
    keep their input parallelism."""
    from bloom_filter_spark.operators.build import (_bound_state_volume,
                                                    build_partials)
    from bloom_filter_spark.operators.merge import (AUTO_TREE_THRESHOLD_BYTES,
                                                    state_size_estimate)
    from bloom_filter_spark.sketches import (BloomParams, BloomSketch,
                                             CountingBloomSketch)

    wide = CountingBloomSketch(BloomParams(n=600_000, p=0.01))  # ~33 MB state
    sz = state_size_estimate(wide)
    assert sz > 8 << 20
    many = tokens_df.select("doc_id").repartition(64)
    parts = build_partials(many, wide, "doc_id", "str").count()
    assert parts * sz <= 2 * AUTO_TREE_THRESHOLD_BYTES
    # never below the session's concurrent task slots (scan parallelism)
    sc = spark.sparkContext
    slots = max(1, sc.defaultParallelism
                // int(sc.getConf().get("spark.task.cpus", "1") or "1"))
    assert parts >= min(slots, 64)
    # narrow sketch: input parallelism untouched
    narrow = BloomSketch(BloomParams(n=65_536, p=0.01))
    assert _bound_state_volume(many, narrow).rdd.getNumPartitions() == 64


def test_cbloom_sharded_fold_bit_parity(spark, tokens_df):
    """Sharded changelog fold ≡ monolithic fold bit-for-bit: deletes land on
    different partitions than their inserts (locally negative shards), shard
    rows mix sparse and dense encodings, and the reassembled blob must equal
    the monolithic path's exactly (counter addition commutes)."""
    from bloom_filter_spark.operators import (build_delta_sketch,
                                              build_delta_sketch_sharded)
    from bloom_filter_spark.sketches import BloomParams, CountingBloomSketch

    docs = tokens_df.select("doc_id")
    parity = (F.ascii(F.substring("doc_id", -1, 1)) % 2).alias("par")
    with_par = docs.select("doc_id", parity)
    changelog = (with_par.select("doc_id", F.lit(1).alias("sign"))
                 .unionAll(with_par.where(F.col("par") == 1)
                           .select("doc_id", F.lit(-1).alias("sign")))
                 ).repartition(8, "sign")

    def fresh():
        return CountingBloomSketch(BloomParams(n=10_000, p=0.01))

    mono_blob, mono_n = build_delta_sketch(changelog, fresh(), "doc_id",
                                           "sign", "str", sharded=False)
    for n_shards in (1, 5):
        blob, n = build_delta_sketch_sharded(changelog, fresh(), "doc_id",
                                             "sign", "str", n_shards=n_shards)
        assert blob == mono_blob and n == mono_n


def test_cbloom_delta_route_auto_shards_wide_state(spark, tokens_df, monkeypatch):
    """build_delta_sketch auto-routes: wide states (dense bytes above the
    shard threshold) take the sharded path, narrow ones the monolithic fold
    — and both produce the same blob."""
    from bloom_filter_spark.operators import build as build_mod
    from bloom_filter_spark.sketches import BloomParams, CountingBloomSketch

    changelog = tokens_df.select("doc_id", F.lit(1).alias("sign")).limit(500)

    def fresh():
        return CountingBloomSketch(BloomParams(n=10_000, p=0.01))

    mono, _ = build_mod.build_delta_sketch(changelog, fresh(), "doc_id",
                                           "sign", "str", sharded=False)
    # force the auto route down the sharded path for this narrow filter
    monkeypatch.setattr(build_mod, "SHARD_ROUTE_THRESHOLD_BYTES", 1024)
    auto, _ = build_mod.build_delta_sketch(changelog, fresh(), "doc_id",
                                           "sign", "str")
    assert auto == mono


def test_cbloom_delta_fold_drops_null_signs(spark, tokens_df):
    """A null sign must be filtered in-plan, not coerced to a garbage
    delta (ADVICE r3): folding a changelog with null signs equals folding
    the same changelog with those rows removed."""
    from bloom_filter_spark.operators import build_delta_sketch
    from bloom_filter_spark.sketches import BloomParams, CountingBloomSketch

    base = tokens_df.select("doc_id").limit(300)
    clean = base.select("doc_id", F.lit(1).alias("sign"))
    noisy = clean.unionAll(
        base.limit(40).select(
            "doc_id", F.lit(None).cast("int").alias("sign")))

    def fresh():
        return CountingBloomSketch(BloomParams(n=1000, p=0.01))

    blob_clean, n_clean = build_delta_sketch(clean, fresh(), "doc_id",
                                             "sign", "str")
    blob_noisy, n_noisy = build_delta_sketch(noisy, fresh(), "doc_id",
                                             "sign", "str")
    assert blob_noisy == blob_clean and n_noisy == n_clean


def test_grouped_auto_routes_high_cardinality_to_salted(spark, tokens_df):
    """The auto router must send a 10^5-group domain down the salted path
    (G × |state| would blow every map-side task) while the modest sources
    domain stays map-side; a caller-configured cardinality skips the
    estimate job but routes identically."""
    from bloom_filter_spark.operators import build as build_mod
    from bloom_filter_spark.sketches import HLLParams, HLLSketch
    sk = HLLSketch(HLLParams(b=12))
    wide = spark.range(100_000).select(F.col("id").cast("string").alias("g"))
    strat, est = build_mod._choose_grouped_strategy(wide, sk, "g", None)
    assert strat == "salted" and est > 50_000
    strat2, _ = build_mod._choose_grouped_strategy(tokens_df, sk, "source", None)
    assert strat2 == "mapside"
    strat3, _ = build_mod._choose_grouped_strategy(wide, sk, "g", 100_000)
    assert strat3 == "salted"


def test_grouped_auto_salted_fallback_matches_mapside(spark, tokens_df,
                                                      monkeypatch):
    """End-to-end auto route down the salted fallback: HLL merge is
    commutative and serde canonical, so the fallback's grouped states must
    equal the map-side default bit-for-bit."""
    from bloom_filter_spark.operators import build as build_mod
    from bloom_filter_spark.sketches import HLLParams, HLLSketch

    def run():
        return {r.group: (r.n_items, bytes(r.state))
                for r in build_mod.build_grouped(
                    tokens_df, HLLSketch(HLLParams(b=12)), "source",
                    "tokens", "i32_array", salt_on="doc_id").collect()}

    mapside = run()
    monkeypatch.setattr(build_mod, "MAPSIDE_STATE_BUDGET_BYTES", 1)
    salted = run()
    assert salted == mapside and len(mapside) > 0


def test_merge_tree_level_renumbers_dense(spark):
    """Each tree level must emit DENSE group ids 0..G-1 (not the original
    partition ids): the byte-aware fanin cap assumes floor-div grouping at
    the next level packs at most `fanin` rows per task, which only holds if
    ids renumber every level.  Also holds for SPARSE input ids (a
    checkpoint read-back can skip ids)."""
    from bloom_filter_spark.operators.merge import _tree_level, PARTIAL_SCHEMA
    from bloom_filter_spark.sketches import BloomParams, BloomSketch

    sk = BloomSketch(BloomParams(n=256, p=0.01))
    rows = []
    for pid in (0, 1, 2, 3, 4, 5):
        st = sk.empty()
        sk.update_i32(st, np.arange(pid * 10, pid * 10 + 10, dtype=np.int32))
        rows.append((pid, 10, bytearray(sk.serialize(st))))
    df = spark.createDataFrame(rows, PARTIAL_SCHEMA)
    lvl = {r.partition_id: r.n_items
           for r in _tree_level(df, sk, fanin=2).collect()}
    assert lvl == {0: 20, 1: 20, 2: 20}  # dense ids, fanin-sized groups
    # sparse ids (simulating skipped partials) still renumber densely at
    # the next level: floor-div of {0,1,2} with fanin=2 → {0, 1}
    sparse = spark.createDataFrame(
        [rows[0], (64, 10, rows[1][2]), (129, 10, rows[2][2])], PARTIAL_SCHEMA)
    lvl1 = _tree_level(sparse, sk, fanin=64)
    ids1 = sorted(r.partition_id for r in lvl1.collect())
    assert ids1 == [0, 1, 2]  # floor-div groups of the sparse ids
    ids2 = sorted(r.partition_id for r in _tree_level(lvl1, sk, 2).collect())
    assert ids2 == [0, 1]  # renumbered dense → next level packs ≤ fanin


def test_cbloom_sharded_multilevel_merge_parity(spark, tokens_df, monkeypatch):
    """When partials-per-shard exceed the byte-aware fanin, pre-merge
    levels must fold fanin-sized slices first (bounding per-task input) and
    still reassemble bit-identically to the monolithic fold."""
    from bloom_filter_spark.operators import (build_delta_sketch,
                                              build_delta_sketch_sharded)
    from bloom_filter_spark.operators import merge as merge_mod
    from bloom_filter_spark.sketches import BloomParams, CountingBloomSketch

    changelog = (tokens_df.select("doc_id", F.lit(1).alias("sign"))
                 .repartition(8))

    def fresh():
        return CountingBloomSketch(BloomParams(n=10_000, p=0.01))

    mono, n_mono = build_delta_sketch(changelog, fresh(), "doc_id", "sign",
                                      "str", sharded=False)
    monkeypatch.setattr(merge_mod, "AUTO_TREE_THRESHOLD_BYTES", 1)  # fanin=2
    blob, n = build_delta_sketch_sharded(changelog, fresh(), "doc_id",
                                         "sign", "str", n_shards=3)
    assert blob == mono and n == n_mono


def test_cbloom_sharded_sparse_and_dense_switch_parity(spark, tokens_df):
    """The sparse-accumulation fold must be bit-identical to the monolithic
    path in BOTH regimes: a wide filter where partitions stay sparse end to
    end, and a narrow filter where every partition crosses the m/3
    break-even and switches to the dense array mid-fold."""
    from bloom_filter_spark.operators import (build_delta_sketch,
                                              build_delta_sketch_sharded)
    from bloom_filter_spark.sketches import BloomParams, CountingBloomSketch

    parity = (F.ascii(F.substring("doc_id", -1, 1)) % 2).alias("par")
    with_par = tokens_df.select("doc_id", parity)
    changelog = (with_par.select("doc_id", F.lit(1).alias("sign"))
                 .unionAll(with_par.where(F.col("par") == 1)
                           .select("doc_id", F.lit(-1).alias("sign")))
                 ).repartition(8, "sign")
    # wide filter: per-partition entries ≪ m/3 → pure sparse emission
    # narrow filter: entries ≫ m/3 → switches to dense mid-fold
    for cap in (200_000, 300):
        mono, n_mono = build_delta_sketch(
            changelog, CountingBloomSketch(BloomParams(n=cap, p=0.01)),
            "doc_id", "sign", "str", sharded=False)
        blob, n = build_delta_sketch_sharded(
            changelog, CountingBloomSketch(BloomParams(n=cap, p=0.01)),
            "doc_id", "sign", "str", n_shards=5)
        assert blob == mono and n == n_mono, cap


def test_sharded_changelog_checkpoint_resume(spark, tokens_df, tmp_path):
    """Sharded (wide-state) changelog partials persist through the lineage
    table under the SHARD_LEVEL marker and resume to the SAME blob
    bit-for-bit — wide-state builds are as resumable as monolithic ones,
    and resume() auto-detects the layout."""
    from bloom_filter_spark.operators import (SketchCheckpoint,
                                              build_delta_sketch,
                                              build_delta_sketch_sharded)
    from bloom_filter_spark.sketches import BloomParams, CountingBloomSketch

    parity = (F.ascii(F.substring("doc_id", -1, 1)) % 2).alias("par")
    with_par = tokens_df.select("doc_id", parity)
    changelog = (with_par.select("doc_id", F.lit(1).alias("sign"))
                 .unionAll(with_par.where(F.col("par") == 1)
                           .select("doc_id", F.lit(-1).alias("sign")))
                 ).repartition(8, "sign")

    def fresh():
        return CountingBloomSketch(BloomParams(n=10_000, p=0.01))

    direct, n_direct = build_delta_sketch(changelog, fresh(), "doc_id",
                                          "sign", "str", sharded=False)
    ck = SketchCheckpoint(str(tmp_path / "ckpt"))
    built, n_built = build_delta_sketch_sharded(
        changelog, fresh(), "doc_id", "sign", "str", n_shards=5,
        checkpoint=ck, sketch_id="cb_shard")
    assert built == direct and n_built == n_direct
    # resume from the persisted shard partials alone
    blob, n = ck.resume(spark, "cb_shard", fresh())
    assert blob == direct and n == n_direct
    # and the final table holds it too
    fblob, fn = ck.read_final(spark, "cb_shard")
    assert fblob == direct and fn == n_direct


def test_shard_merge_exactly_one_exchange_per_wave(spark):
    """Plan-shape pin for merge_shard_partials (VERDICT r4 #7): each merge
    wave is ONE hash Exchange (the groupBy on shard_id / (shard_id, grp)).
    The trap this guards: deriving the fold key from an expression
    evaluated at merge time (e.g. Window.partitionBy(spark_partition_id))
    silently added a second full-data Exchange once before — src is now a
    persisted COLUMN, so the level grouping must not re-shuffle anything
    beyond its own groupBy."""
    from bloom_filter_spark.operators.build import (
        build_delta_shard_partials, merge_shard_partials)
    from bloom_filter_spark.sketches import BloomParams, CountingBloomSketch

    df = spark.createDataFrame(
        [(f"doc_{i}", 1) for i in range(2000)], "id string, sign int"
    ).repartition(8)
    sk = CountingBloomSketch(BloomParams(n=4000, p=0.01))
    partials = build_delta_shard_partials(df, sk, "id", "sign",
                                          value_kind="str", n_shards=4)

    # single wave (P <= fanin): exactly one Exchange in the whole merge
    merged = merge_shard_partials(partials, sk, est_partials=8)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    # the input repartition is a RoundRobin Exchange; the merge itself must
    # contribute exactly its groupBy hash Exchanges and nothing more
    assert plan.count("Exchange hashpartitioning") == 1, plan

    # forced pre-level (tiny est_partials => while-loop runs): one
    # Exchange PER wave - groupBy(shard_id, grp) then groupBy(shard_id) -
    # and none anywhere else (no hidden full-data shuffle from the src
    # column or the level renumbering)
    from bloom_filter_spark.operators import merge as merge_mod
    fanin = max(2, int(merge_mod.AUTO_TREE_THRESHOLD_BYTES
                       // max(1, merge_mod.state_size_estimate(sk)
                              // sk.shard_count())))
    waves = 1
    p = 1000 * fanin  # pretend a 1000x fleet: ceil-log_fanin levels
    while p > fanin:
        waves += 1
        p = -(-p // fanin)
    merged_big = merge_shard_partials(partials, sk,
                                      est_partials=1000 * fanin)
    plan_big = merged_big._jdf.queryExecution().executedPlan().toString()
    assert plan_big.count("Exchange hashpartitioning") == waves, \
        (waves, plan_big)


def test_point_str_udf_strbuf_bit_identical(spark):
    """The string point-probe UDF now routes pandas→Arrow→StrBuf (VERDICT
    r5 #5) — estimates must be bit-identical to the object-list kernel
    path, for CMS and Count-Sketch, with NULL keys pinned to 0."""
    from bloom_filter_spark.sketches import (
        CMSSketch, CMSParams, CountSketch, CountSketchParams)
    keys = [f"tok{i % 97}" for i in range(20_000)] + ["solo", "", "xx"]
    kdf = spark.createDataFrame([(k,) for k in keys], "k string")
    probes = [f"tok{i}" for i in range(120)] + ["solo", "", "absent", None]
    pdf = spark.createDataFrame([(p,) for p in probes], "p string")
    for sketch in (CMSSketch(CMSParams(eps=0.001, delta=0.001)),
                   CountSketch(CountSketchParams(w=1 << 12, d=5))):
        blob, _ = build_sketch(kdf, sketch, "k", "str")
        point = cms_point_udf(spark, blob, "str", kind=sketch.kind)
        got = {r.p: r.est for r in
               pdf.withColumn("est", point(F.col("p"))).collect()}
        sk, state = type(sketch).deserialize(blob)
        want = sk.point_str(state, [p for p in probes if p is not None])
        for p, w in zip([p for p in probes if p is not None], want):
            assert got[p] == int(w), (sketch.kind, p, got[p], int(w))
        assert got[None] == 0

"""sf0.1-vs-sf1 endurance evidence for the round-4 curation operators.

Runs the new training-data curation ops (decontamination, boilerplate,
repetition, hash split, stratified sampling, packing offsets) on the
deterministic documents fixture twins at two scales in ONE session and
reports per-document throughput retention (sf1 docs/s ÷ sf0.1 docs/s) —
the same evidence shape BENCH/bench_sf1_pipeline.json carries for the
dedup/ANN suite.  Retention ≈ 1 (or above, as fixed costs amortize) is the
"no superlinear term" check; a retention well below 1 flags an operator
whose cost grows faster than its input.

Usage: python tools/run_sf1_curation.py [--cpus 32]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])

    from pyspark.sql import functions as F

    from bloom_filter_spark.functions import dedup, pii, profiling, sampling, textstats
    from bloom_filter_spark.session import get_spark
    from bloom_filter_spark.sources.fixtures import ensure_doc_fixtures

    spark = get_spark("sf1-curation", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    def ops(docs, scratch=None):
        return {
            "contamination_check": lambda: dedup.contamination_check(
                docs.where(F.col("doc_id") % 10 != 0),
                docs.where(F.col("doc_id") % 10 == 0)).count(),
            "boilerplate_ngrams": lambda: dedup.boilerplate_ngrams(
                docs, min_docs=5).count(),
            "repeated_spans": lambda: dedup.repeated_spans(
                docs, width=5, min_docs=2).count(),
            "repetition_score": lambda: textstats.repetition_score(
                docs).count(),
            "hash_split": lambda: sampling.hash_split(
                docs, "doc_id",
                {"train": 0.8, "val": 0.1, "test": 0.1}).count(),
            "stratified_sample": lambda: sampling.stratified_hash_sample(
                docs, "doc_id", "lang", {"en": 0.5, "de": 0.25}).count(),
            "pack_offsets": lambda: sampling.pack_offsets(
                docs, "doc_id", "n_chars", 2048).count(),
            # write action: a bare count() lets EliminateSorts drop the
            # partition-local sort that IS the shuffle's dominant cost
            "epoch_shuffle": lambda: sampling.epoch_shuffle(
                docs, "doc_id", epoch=1).write.mode("overwrite")
                .parquet(os.path.join(scratch, "epoch_shuffle")),
            # fixture twins use src_00..src_07 (fixtures.py SOURCES), NOT
            # the driver testdata's src0..src19 — keys must match or the
            # bench exercises only the default x1 identity path
            "mixture_sample": lambda: sampling.mixture_sample(
                docs, "doc_id", "source",
                {"src_00": 2.5, "src_01": 0.3, "src_02": 0.0}).count(),
            "trim_by_group_rank": lambda: sampling.trim_by_group_rank(
                docs, "n_chars", "source", 0.05, 0.95).count(),
            "tfidf_top_terms": lambda: textstats.tfidf_top_terms(
                docs, k=5).count(),
            "exact_dedup_incremental": lambda: dedup.exact_dedup_incremental(
                dedup.exact_dedup(docs.where(F.col("doc_id") % 2 == 0)),
                docs.where(F.col("doc_id") % 2 == 1)).count(),
            "pii_scan": lambda: pii.pii_scan(docs).count(),
        }

    import tempfile
    scratch = tempfile.mkdtemp(prefix="sf1cur_")
    out = {"cpus": cpus, "scales": {}, "retention": {}}
    counts = {}
    for sf in ("sf0.1", "sf1"):
        dd = ensure_doc_fixtures(sf)
        docs = spark.read.parquet(f"{dd}/documents.parquet")
        n_docs = docs.count()  # warms the scan
        counts[sf] = n_docs
        times = {}
        for name, fn in ops(docs, scratch).items():
            best = None
            for _ in range(2):  # best-of-2 per the bench policy
                t0 = time.time()
                fn()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            times[name] = round(best, 3)
        # token-table ops (drift) ride the tokens fixture at the same scale
        from bloom_filter_spark.sources.fixtures import ensure_fixtures
        toks = spark.read.parquet(f"{ensure_fixtures(sf)}/tokens.parquet")
        toks.select(F.sum(F.size("tokens"))).collect()  # warm
        for name, fn in {
            "token_drift_psi": lambda: profiling.token_distribution_drift(
                toks, "source", "tokens", "src_00", "src_01").count(),
            "token_drift_ks_exact": lambda: profiling.exact_ks(
                toks, "source", "n_tok", "src_00", "src_01").count(),
        }.items():
            best = None
            for _ in range(2):
                t0 = time.time()
                fn()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            times[name] = round(best, 3)
        # quantized ANN rides the embeddings fixture twin (VERDICT r5 #7):
        # broadcast query set + int8 corpus scan + window top-k — the
        # retention check is per-VECTOR throughput at 10× the vectors
        from bloom_filter_spark.functions import similarity
        emb = spark.read.parquet(f"{dd}/embeddings.parquet")
        emb.count()  # warm
        best = None
        for _ in range(2):
            t0 = time.time()
            similarity.quantized_topk(emb, list(range(20)), k=5).count()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        times["quantized_topk"] = round(best, 3)
        out["scales"][sf] = {"n_docs": n_docs, "times_s": times}
    for name in out["scales"]["sf0.1"]["times_s"]:
        t01 = out["scales"]["sf0.1"]["times_s"][name]
        t1 = out["scales"]["sf1"]["times_s"][name]
        thr01 = counts["sf0.1"] / t01
        thr1 = counts["sf1"] / t1
        out["retention"][name] = round(thr1 / thr01, 3)
    out["note"] = ("retention = (sf1 docs/s) / (sf0.1 docs/s), best-of-2 "
                   "per line in one session; >= ~1 means no superlinear "
                   "term surfaced at 10x the documents")
    path = os.path.join(REPO, "BENCH", "curation_sf1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

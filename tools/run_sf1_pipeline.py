"""sf1 endurance evidence for the dedup/ANN pipeline (verdict r2 #3).

Round 2's sf1 run covered only the sketch suite; the dedup/ANN operators
had never executed above the driver testdata's 5k-doc/2k-vector cap.  This
runs them on the deterministic documents/embeddings fixture twins at
sf0.1 AND sf1 (10× rows) in one session and reports per-word / per-vector
throughput retention — the same evidence shape as the sketch suite's
per-token retention (BENCH/bench_sf1.json).

Usage: python tools/run_sf1_pipeline.py [--cpus 32] → BENCH/bench_sf1_pipeline.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--scales", default="sf0.1,sf1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bloom_filter_spark.functions import dedup, similarity
    from bloom_filter_spark.session import get_spark
    from bloom_filter_spark.sources.fixtures import ensure_doc_fixtures

    spark = get_spark("sf1-pipeline", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    out: dict = {"cpus": args.cpus, "scales": {}}

    for sf_name in args.scales.split(","):
        fdir = ensure_doc_fixtures(sf_name)
        docs = spark.read.parquet(f"{fdir}/documents.parquet")
        emb = spark.read.parquet(f"{fdir}/embeddings.parquet")
        n_docs = docs.count()
        n_words = docs.select(
            F.sum(F.size(F.split("text", " ")))).collect()[0][0]
        n_vecs = emb.count()
        row: dict = {"n_docs": n_docs, "n_words": int(n_words),
                     "n_vectors": n_vecs, "ops": {}}

        def timed(name, fn, unit_count):
            t0 = time.time()
            n_out = fn()
            el = round(time.time() - t0, 3)
            row["ops"][name] = {
                "secs": el, "n_output_rows": int(n_out),
                "units_per_sec": round(unit_count / el, 0)}
            print(f"{sf_name} {name}: {el}s, {n_out} rows", file=sys.stderr)

        timed("dedup_exact", lambda: dedup.exact_dedup(docs).count(), n_words)
        timed("dedup_minhash_lsh",
              lambda: dedup.minhash_lsh_pairs(docs, threshold=0.5).count(),
              n_words)
        timed("dedup_simhash",
              lambda: dedup.simhash_pairs(docs, max_hamming=7).count(),
              n_words)
        timed("dedup_ngram_jaccard_capped",
              lambda: dedup.ngram_jaccard_pairs(
                  docs, threshold=0.5, df_cap=1000).count(), n_words)
        timed("neardup_clusters",
              lambda: dedup.near_dup_clusters(
                  dedup.minhash_lsh_pairs(docs, threshold=0.5)).count(),
              n_words)
        timed("embedding_lsh_neardup",
              lambda: similarity.lsh_neardup_pairs(
                  emb, threshold=0.85, n_bits=16, n_tables=8).count(), n_vecs)
        timed("embedding_ivf_topk",
              lambda: similarity.ivf_topk(
                  emb, list(range(10)), k=5, n_lists=16, n_probe=4).count(),
              n_vecs)
        out["scales"][sf_name] = row

    scales = list(out["scales"])
    if len(scales) == 2:
        a, b = out["scales"][scales[0]], out["scales"][scales[1]]
        out["retention"] = {
            op: round(b["ops"][op]["units_per_sec"]
                      / a["ops"][op]["units_per_sec"], 3)
            for op in a["ops"] if op in b["ops"]}
        out["retention_note"] = (
            f"per-unit throughput at {scales[1]} / {scales[0]} "
            "(1.0 = perfectly linear scaling; the sketch suite's sf1 "
            "retention was 0.96)")
        out["notes"] = {
            "dedup_ngram_jaccard_capped": (
                "retention >= 1 after r3's discovery-join counting (the "
                "former verify pass re-walked every candidate's full "
                "shingle list - the superlinear term).  Candidate-pair "
                "mass still grows with sum(df^2), bounded by the df-cap; "
                "minhash-LSH remains the preferred 100-TB near-dup path."),
            "retention_gt_1": (
                "values > 1.0 mean per-unit throughput IMPROVED at 10x "
                "rows - at sf0.1's 5k docs / 2k vectors, per-query fixed "
                "costs (session, Python worker spin-up, plan time) "
                "dominate the wall clock."),
        }
    path = os.path.join(REPO, "BENCH", "bench_sf1_pipeline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

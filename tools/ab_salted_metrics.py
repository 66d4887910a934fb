"""Noise-immune adjudication of the `hll_grouped_by_source_salted` line.

Wall-clock A/Bs on this host are hopeless during contended windows (the two
committed AB_salted_r6 timing runs show the CONTROL arm varying 2.3 → 35 s
on identical binaries).  This tool compares what contention cannot forge:
per-arm totals of executor CPU time, shuffle read/write bytes, task counts
and input rows, pulled from the Spark REST API after running each arm under
a dedicated job group.  Run it twice — PYTHONPATH at HEAD and at the r4
commit (b486b9a) via a git worktree, same fixtures via
SPARK_GRAFT_FIXTURE_ROOT — and diff the JSON: identical shuffle bytes/task
counts prove the kernel does the same work, and the CPU-time ratio
salted/bloom is the contention-robust analog of the driver ratio (r4 1.83,
r5 2.30).

Usage: python tools/ab_salted_metrics.py [sf_dir] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.environ.get("AB_PYTHONPATH_FIRST") != "1":
    sys.path.insert(0, REPO)


def _rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications", timeout=10) as r:
        app = json.load(r)[0]["id"]
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}{path}", timeout=10) as r:
        return json.load(r)


def _stage_totals(stages, ids):
    tot = {"cpu_s": 0.0, "run_s": 0.0, "shuffle_write_mb": 0.0,
           "shuffle_read_mb": 0.0, "input_records": 0, "output_rows": 0,
           "tasks": 0, "stages": 0}
    for s in stages:
        if s["stageId"] not in ids or s["status"] != "COMPLETE":
            continue
        tot["cpu_s"] += s.get("executorCpuTime", 0) / 1e9
        tot["run_s"] += s.get("executorRunTime", 0) / 1e3
        tot["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
        tot["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / 1e6
        tot["input_records"] += s.get("inputRecords", 0)
        tot["tasks"] += s.get("numCompleteTasks", 0)
        tot["stages"] += 1
    return {k: round(v, 3) if isinstance(v, float) else v
            for k, v in tot.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bloom_filter_spark.operators import build_grouped, build_sketch
    from bloom_filter_spark.session import get_spark
    from bloom_filter_spark.sketches import (
        BloomParams, BloomSketch, HLLParams, HLLSketch)
    from bloom_filter_spark.sources.fixtures import (
        ensure_fixtures, sf_name_of_dir)

    import bloom_filter_spark
    pkg = os.path.dirname(os.path.abspath(bloom_filter_spark.__file__))

    fx = ensure_fixtures(sf_name_of_dir(args.sf_dir))
    spark = get_spark("ab_salted_metrics", master="local[32]",
                      shuffle_partitions=32)
    sc = spark.sparkContext
    tokens = spark.read.parquet(f"{fx}/tokens.parquet")
    tokens.select(F.sum(F.size("tokens"))).collect()   # warm page cache
    build_sketch(tokens.limit(2000), BloomSketch(BloomParams(n=1024, p=0.01)),
                 "tokens", "i32_array", repartition=32)  # warm workers

    def bloom():
        build_sketch(tokens, BloomSketch(BloomParams(n=65_536, p=0.01)),
                     "tokens", "i32_array")

    def mapside():
        build_grouped(tokens, HLLSketch(HLLParams(b=12)), "source", "tokens",
                      "i32_array", strategy="mapside").collect()

    def salted():
        build_grouped(tokens, HLLSketch(HLLParams(b=12)), "source", "tokens",
                      "i32_array", n_salts=32, salt_on="doc_id",
                      strategy="salted").collect()

    results = {}
    for name, fn in (("bloom", bloom), ("mapside", mapside),
                     ("salted", salted)):
        before = {s["stageId"] for s in _rest(spark, "/stages")}
        sc.setJobGroup(name, name)
        t0 = time.time()
        fn()
        wall = time.time() - t0
        sc.setJobGroup("idle", "idle")
        stages = _rest(spark, "/stages")
        new_ids = {s["stageId"] for s in stages} - before
        results[name] = {"wall_s": round(wall, 3),
                         **_stage_totals(stages, new_ids)}
        print(name, json.dumps(results[name]), flush=True)

    out = {
        "pkg": pkg, "sf_dir": args.sf_dir,
        "arms": results,
        "cpu_ratio_salted_over_bloom": round(
            results["salted"]["cpu_s"] / results["bloom"]["cpu_s"], 3),
        "cpu_ratio_salted_over_mapside": round(
            results["salted"]["cpu_s"] / results["mapside"]["cpu_s"], 3),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("pkg", "cpu_ratio_salted_over_bloom",
                       "cpu_ratio_salted_over_mapside")}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Adjudicate the `countsketch_build` driver reading (VERDICT r5 #3):
10.06 s driver vs the builder's 4.70 s near-quiet claim — kernel cost or
throttle?  Same contention-immune method as tools/ab_salted_metrics.py:
run the EXACT bench arms for countsketch_build and cms_build (same input,
similar d×w counter state math) under job groups and compare executor CPU
time + task/stage/shuffle metrics from the REST API.  If countsketch's CPU
time lands within ~1.3× of cms's, the 10.06 s wall reading was contention
on a line with no quiet driver baseline yet; a larger CPU gap means the
fused signed-bincount kernel really is more expensive and needs work.

Usage: SPARK_GRAFT_UI=true python tools/ab_countsketch_metrics.py [sf_dir]
Writes BENCH/AB_countsketch_metrics_r6.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(1, os.path.join(REPO, "tools"))

from ab_salted_metrics import _rest, _stage_totals  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_UI", "true")

    from pyspark.sql import functions as F

    from bloom_filter_spark.operators import build_sketch
    from bloom_filter_spark.session import get_spark
    from bloom_filter_spark.sketches import (
        CMSParams, CMSSketch, CountSketch, CountSketchParams)
    from bloom_filter_spark.sources.fixtures import (
        ensure_fixtures, sf_name_of_dir)

    fx = ensure_fixtures(sf_name_of_dir(sf_dir))
    spark = get_spark("ab_countsketch_metrics", master="local[32]",
                      shuffle_partitions=32)
    sc = spark.sparkContext
    tokens = spark.read.parquet(f"{fx}/tokens.parquet")
    tokens.select(F.sum(F.size("tokens"))).collect()
    build_sketch(tokens.limit(2000),
                 CMSSketch(CMSParams(eps=0.01, delta=0.01)),
                 "tokens", "i32_array")  # warm workers

    def cms():
        build_sketch(tokens, CMSSketch(CMSParams(eps=0.0001, delta=0.001)),
                     "tokens", "i32_array")

    def countsketch():
        build_sketch(tokens, CountSketch(CountSketchParams(w=1 << 15, d=5)),
                     "tokens", "i32_array")

    results: dict[str, list] = {"cms": [], "countsketch": []}
    for rnd in range(3):
        arms = [("cms", cms), ("countsketch", countsketch)]
        if rnd % 2:
            arms.reverse()
        for name, fn in arms:
            before = {s["stageId"] for s in _rest(spark, "/stages")}
            sc.setJobGroup(name, name)
            t0 = time.time()
            fn()
            wall = time.time() - t0
            sc.setJobGroup("idle", "idle")
            stages = _rest(spark, "/stages")
            ids = {s["stageId"] for s in stages} - before
            rec = {"wall_s": round(wall, 3), **_stage_totals(stages, ids)}
            results[name].append(rec)
            print(rnd, name, json.dumps(rec), flush=True)

    best_cpu = {n: min(r["cpu_s"] for r in v) for n, v in results.items()}
    out = {
        "sf_dir": sf_dir, "rounds": 3, "runs": results,
        "best_cpu_s": best_cpu,
        "cpu_ratio_countsketch_over_cms": round(
            best_cpu["countsketch"] / best_cpu["cms"], 3),
        "best_wall_s": {n: min(r["wall_s"] for r in v)
                        for n, v in results.items()},
        "reference": {"r5_driver_wall": {"countsketch_build": 10.06,
                                          "cms_build": 4.84},
                      "builder_local_claim": {"countsketch_build": 4.70,
                                               "cms_build": 4.0}},
    }
    with open(os.path.join(REPO, "BENCH",
                           "AB_countsketch_metrics_r6.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("best_cpu_s", "cpu_ratio_countsketch_over_cms",
                       "best_wall_s")}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Interleaved A/B: Arrow→Python string conversion vs zero-copy StrBuf.

Isolates exactly the change of VERDICT r4 #3 — the ONLY delta between arms
is how a str-keyed Arrow batch reaches the hash kernels:
  A (old): col.to_pylist() → object list → np.char.encode padded matrix
  B (new): arrow_strbuf(col) → flat-buffer FNV fold, no Python objects
on bloom_doc_membership-shaped data (5M short doc-id strings, Arrow batches
of 64k rows — the shape mapInArrow hands the build/probe kernels).
Rotating order, best + median per arm, one process (same noise regime).

Usage: python3 tools/ab_strbuf.py [rounds=6]
"""

import json
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, ".")
from bloom_filter_spark.core.hashing import arrow_strbuf  # noqa: E402
from bloom_filter_spark.sketches.bloom import BloomParams, BloomSketch  # noqa: E402

N = 5_000_000
BATCH = 65_536


def make_batches():
    ids = [f"doc_{i:09d}" for i in range(N)]
    arr = pa.array(ids, pa.string())
    return [arr.slice(o, min(BATCH, N - o)) for o in range(0, N, BATCH)]


def run_build(batches, sk, mode):
    state = sk.empty()
    t0 = time.perf_counter()
    for col in batches:
        vals = col.to_pylist() if mode == "list" else arrow_strbuf(col)
        sk.update_str(state, vals)
    return time.perf_counter() - t0, state


def run_probe(batches, sk, state, mode):
    t0 = time.perf_counter()
    hits = 0
    for col in batches:
        vals = col.to_pylist() if mode == "list" else arrow_strbuf(col)
        hits += int(sk.contains_str(state, vals).sum())
    return time.perf_counter() - t0, hits


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    batches = make_batches()
    sk = BloomSketch(BloomParams(n=N, p=0.01))
    res = {k: [] for k in ("build_list", "build_strbuf",
                           "probe_list", "probe_strbuf")}
    state = None
    for r in range(rounds):
        order = ("list", "strbuf") if r % 2 == 0 else ("strbuf", "list")
        for mode in order:
            dt, st = run_build(batches, sk, mode)
            res[f"build_{mode}"].append(dt)
            state = st
        for mode in order:
            dt, hits = run_probe(batches, sk, state, mode)
            assert hits == N  # zero FN both arms
            res[f"probe_{mode}"].append(dt)
        print(f"round {r}: " + " ".join(
            f"{k}={res[k][-1]:.2f}s" for k in res), file=sys.stderr)
    out = {"n_keys": N, "batch": BATCH, "rounds": rounds}
    for k, v in res.items():
        out[k] = {"best_s": round(min(v), 3),
                  "median_s": round(sorted(v)[len(v) // 2], 3),
                  "best_mkeys_s": round(N / min(v) / 1e6, 1)}
    out["build_speedup_best"] = round(
        out["build_list"]["best_s"] / out["build_strbuf"]["best_s"], 2)
    out["probe_speedup_best"] = round(
        out["probe_list"]["best_s"] / out["probe_strbuf"]["best_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

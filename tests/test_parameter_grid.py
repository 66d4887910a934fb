"""FIXTURES.md parameter grid — the reference's test literals plus the
mandated extension grids, each kind swept for its invariants."""

import numpy as np
import pytest

from bloom_filter_spark.sketches import (
    BloomParams, BloomSketch, CMSParams, CMSSketch, CuckooParams, CuckooFilter,
    HLLParams, HLLSketch, KLLParams, KLLSketch, TDigestParams, TDigestSketch,
)


@pytest.mark.parametrize("n,p", [
    (100, 0.01), (1000, 0.05), (10000, 0.1),      # bloom/filter_test.go:19-21
    (1_000_000, 0.003142),                         # filter_test.go:236-237
    (1_000_000, 0.01),                             # main.go:24-25
])
def test_bloom_grid_invariants(n, p):
    sk = BloomSketch(BloomParams(n=n, p=p))
    rng = np.random.default_rng(n)
    inserted = rng.choice(2_000_000, size=min(n, 50_000), replace=False).astype(np.int32)
    state = sk.empty()
    sk.update_i32(state, inserted)
    assert sk.contains_i32(state, inserted).all()           # zero FN
    foreign = np.arange(2_100_000, 2_120_000, dtype=np.int32)
    assert sk.contains_i32(state, foreign).mean() <= p      # FPR ≤ p (Q3)
    blob = sk.serialize(state)
    _, st2 = BloomSketch.deserialize(blob)
    np.testing.assert_array_equal(state, st2)


@pytest.mark.parametrize("n,lf,expect_m", [
    (100, 0.95, 32),       # cuckoo/filter_test.go:20-27
    (10_000, 0.8, 4096),   # cuckoo/filter_test.go:28-34
    (1_000_000, 0.95, 524288),  # comparison_test.go:15-17: nextpow2(263158)
])
def test_cuckoo_grid(n, lf, expect_m):
    params = CuckooParams(n=n, load_factor=lf)
    assert params.m == expect_m
    cf = CuckooFilter(params)
    state = cf.empty()
    keys = np.arange(min(n, 20_000), dtype=np.int32)
    assert cf.insert_i32(state, keys) == 0
    assert cf.contains_i32(state, keys).all()


@pytest.mark.parametrize("b", [10, 12, 14])
def test_hll_grid(b):
    sk = HLLSketch(HLLParams(b=b))
    state = sk.empty()
    true_n = 30_000
    sk.update_i64(state, np.arange(true_n, dtype=np.int64))
    est = sk.estimate(state)
    assert abs(est - true_n) <= 4 * sk.params.std_error * true_n


@pytest.mark.parametrize("eps,delta", [(0.001, 0.01), (0.0001, 0.001)])
def test_cms_grid(eps, delta):
    sk = CMSSketch(CMSParams(eps=eps, delta=delta))
    assert sk.params.w == int(np.ceil(np.e / eps))
    assert sk.params.d == int(np.ceil(np.log(1 / delta)))
    state = sk.empty()
    rng = np.random.default_rng(7)
    vals = (rng.zipf(1.5, 50_000) % 5000).astype(np.int32)
    sk.update_i32(state, vals)
    uniq, cnt = np.unique(vals, return_counts=True)
    est = sk.point_i32(state, uniq)
    assert (est >= cnt).all()
    assert ((est - cnt) <= eps * vals.size).mean() >= 1 - 5 * delta


@pytest.mark.parametrize("k", [128, 256])
def test_kll_grid(k):
    sk = KLLSketch(KLLParams(k=k))
    state = sk.empty()
    rng = np.random.default_rng(9)
    vals = rng.uniform(0, 1, 100_000)
    for chunk in np.array_split(vals, 10):
        sk.update(state, chunk)
    qs = np.array([0.1, 0.5, 0.9])
    est = sk.quantiles(state, qs)
    sv = np.sort(vals)
    ranks = np.searchsorted(sv, est, side="right") / vals.size
    assert np.abs(ranks - qs).max() <= sk.params.rank_error * 1.5


@pytest.mark.parametrize("compression", [100, 200])
def test_tdigest_grid(compression):
    sk = TDigestSketch(TDigestParams(compression=compression))
    state = sk.empty()
    rng = np.random.default_rng(10)
    vals = rng.gamma(2, 3, 100_000)
    for chunk in np.array_split(vals, 8):
        sk.update(state, chunk)
    assert state.means.size <= compression + 1
    qs = np.array([0.01, 0.5, 0.99])
    est = sk.quantiles(state, qs)
    sv = np.sort(vals)
    ranks = np.searchsorted(sv, est, side="right") / vals.size
    assert np.abs(ranks - qs).max() <= 0.03


def test_merge_perm_harness_f5():
    """FIXTURES.md F5: 16 partials, 5 seeded permutations + left-fold +
    balanced-tree orders — bit-identical for Bloom/HLL/CMS."""
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 50_257, 200_000).astype(np.int32)
    chunks = np.array_split(vals, 16)
    for sk in (BloomSketch(BloomParams(n=65_536, p=0.01)),
               HLLSketch(HLLParams(b=12)),
               CMSSketch(CMSParams(eps=0.001, delta=0.01))):
        parts = []
        for c in chunks:
            st = sk.empty()
            sk.update_i32(st, c)
            parts.append(st)

        def left_fold(order):
            acc = parts[order[0]]
            for i in order[1:]:
                acc = sk.merge(acc, parts[i])
            return acc

        def tree(lo, hi):
            if hi - lo == 1:
                return parts[lo]
            mid = (lo + hi) // 2
            return sk.merge(tree(lo, mid), tree(mid, hi))

        ref = left_fold(list(range(16)))
        np.testing.assert_array_equal(ref, tree(0, 16))
        for s in range(5):
            order = np.random.default_rng((44, s)).permutation(16)
            np.testing.assert_array_equal(ref, left_fold(list(order)))

"""Pure-numpy Bloom kernel tests — ports the reference's test patterns:
constructor sanity, hash determinism, white-box bit setting, zero false
negatives, FPR vs configured p, serde round-trip, merge=OR.
(reference: /root/reference/filter/bloom/filter_test.go)
"""

import numpy as np
import pytest

from bloom_filter_spark.core import hashing
from bloom_filter_spark.sketches import BloomParams, BloomSketch


def test_next_power_of_two_reference_semantics():
    # /root/reference/filter/utils.go:23-31: 0→0, exact powers fixed
    assert hashing.next_power_of_two(0) == 0
    assert hashing.next_power_of_two(1) == 1
    assert hashing.next_power_of_two(2) == 2
    assert hashing.next_power_of_two(3) == 4
    assert hashing.next_power_of_two(8) == 8
    assert hashing.next_power_of_two(9) == 16
    assert hashing.next_power_of_two(9_585_059) == 1 << 24


@pytest.mark.parametrize("n,p", [(100, 0.01), (1000, 0.05), (10000, 0.1)])
def test_params_sane(n, p):
    # constructor sanity grid from filter_test.go:19-21
    params = BloomParams(n=n, p=p)
    assert params.m > 0 and params.k > 0
    assert params.m & (params.m - 1) == 0  # power of two
    assert params.n_words == (params.m >> 6) + 1  # quirk Q4 spare word


def test_params_reference_anchors():
    # analytic anchors from BASELINE.md: p=0.01, n=1M → m=2^24, k=7
    p1 = BloomParams(n=1_000_000, p=0.01)
    assert p1.m == 1 << 24 and p1.k == 7
    # p=0.003142, n=1M → m=2^24, k=8 (filter_test.go:235-237 config)
    p2 = BloomParams(n=1_000_000, p=0.003142)
    assert p2.m == 1 << 24 and p2.k == 8


def test_hash_determinism():
    vals = np.array([0, 1, -1, 42, 2147483647, -2147483648], np.int32)
    h1 = hashing.hash64_i32(vals, seed=7)
    h2 = hashing.hash64_i32(vals.copy(), seed=7)
    np.testing.assert_array_equal(h1, h2)
    assert not np.array_equal(h1, hashing.hash64_i32(vals, seed=8))
    # string path
    s = ["doc_1", "doc_2", "", "a"]
    np.testing.assert_array_equal(hashing.hash64_str(s, 1), hashing.hash64_str(list(s), 1))
    assert hashing.hash64_str(["ab"], 1)[0] != hashing.hash64_str(["abc"], 1)[0]


def test_km_indices_structure():
    # index_i = (h1 + i*h2) & (m-1), reference hash.go:5-14
    h = np.array([(5 << 32) | 3], np.uint64)  # h1=3, h2=5
    idx = hashing.km_indices(h, m=16, k=4)
    np.testing.assert_array_equal(idx[0], np.array([3, 8, 13, 2], np.uint64))


def test_insert_sets_exact_bits():
    # white-box: filter_test.go:72-105
    params = BloomParams(n=100, p=0.01)
    sk = BloomSketch(params)
    state = sk.empty()
    vals = np.array([17], np.int32)
    sk.update_i32(state, vals)
    idx = hashing.km_indices(hashing.hash64_i32(vals, params.seed), params.m, params.k)[0]
    for i in idx:
        assert (state[int(i) >> 6] >> np.uint64(int(i) & 63)) & np.uint64(1) == 1
    assert int(np.unpackbits(state.view(np.uint8)).sum()) <= params.k


def test_zero_false_negatives_and_fpr():
    # the hard invariant: filter_test.go:134-185, main.go:39-52
    rng = np.random.default_rng(42)
    n = 10_000
    p = 0.01
    inserted = rng.choice(50_000, size=n, replace=False).astype(np.int32)
    sk = BloomSketch(BloomParams(n=n, p=p))
    state = sk.empty()
    sk.update_i32(state, inserted)
    assert sk.contains_i32(state, inserted).all()  # zero FN
    foreign = np.arange(60_000, 70_000, dtype=np.int32)  # guaranteed absent
    fpr = sk.contains_i32(state, foreign).mean()
    assert fpr <= p  # reference rounds m UP → real FPR < p (quirk Q3)


def test_merge_is_or_and_split_equals_whole():
    n, p = 5000, 0.01
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 50_000, n).astype(np.int32)
    sk = BloomSketch(BloomParams(n=n, p=p))
    whole = sk.empty()
    sk.update_i32(whole, vals)
    parts = []
    for chunk in np.array_split(vals, 7):
        st = sk.empty()
        sk.update_i32(st, chunk)
        parts.append(st)
    merged = parts[0]
    for st in parts[1:]:
        merged = sk.merge(merged, st)
    np.testing.assert_array_equal(whole, merged)  # bit-identical
    # associativity/commutativity: permuted merge order
    order = rng.permutation(len(parts))
    merged2 = parts[order[0]]
    for i in order[1:]:
        merged2 = sk.merge(merged2, parts[i])
    np.testing.assert_array_equal(merged, merged2)


def test_serde_round_trip():
    # filter_test.go:187-233: round-trip preserves state and probes exactly
    sk = BloomSketch(BloomParams(n=1000, p=0.05))
    state = sk.empty()
    vals = np.arange(500, dtype=np.int32)
    sk.update_i32(state, vals)
    blob = sk.serialize(state)
    # header: u32 M | u32 K | u64 Seed | (m>>6)+1 words (bloom/filter.go:63-92)
    assert len(blob) == 16 + 8 * sk.params.n_words
    sk2, state2 = BloomSketch.deserialize(blob)
    assert sk2.params.m == sk.params.m and sk2.params.k == sk.params.k
    np.testing.assert_array_equal(state, state2)
    np.testing.assert_array_equal(
        sk.contains_i32(state, vals), sk2.contains_i32(state2, vals)
    )


def test_string_keys_doc_ids():
    sk = BloomSketch(BloomParams(n=1000, p=0.01))
    state = sk.empty()
    docs = [f"doc_{i:010d}" for i in range(1000)]
    sk.update_str(state, docs)
    assert sk.contains_str(state, docs).all()
    ghosts = [f"ghost_{i}" for i in range(5000)]
    assert sk.contains_str(state, ghosts).mean() <= 0.01


def test_large_m_fallback_path():
    # m beyond the packbits threshold exercises the bitwise_or.at branch
    from bloom_filter_spark.core import hashing as H
    params = BloomParams(n=30_000_000, p=0.01)  # m = 2^29 > 2^27 threshold
    assert params.m > H._PACKBITS_MAX_BITS
    sk = BloomSketch(params)
    state = sk.empty()
    vals = np.arange(50_000, dtype=np.int32)
    sk.update_i32(state, vals)
    assert sk.contains_i32(state, vals).all()
    assert sk.contains_i32(state, np.arange(60_000, 80_000, dtype=np.int32)).mean() <= 0.01


def test_bloom_intersect_zero_fn_and_subset():
    """AND-intersection: every true-intersection key stays member; the AND
    filter's member set is a subset of both inputs'."""
    import numpy as np
    from bloom_filter_spark.sketches import BloomParams, BloomSketch
    sk = BloomSketch(BloomParams(n=10_000, p=0.01))
    a_keys = np.arange(0, 8000, dtype=np.int32)
    b_keys = np.arange(5000, 13000, dtype=np.int32)
    a, b = sk.empty(), sk.empty()
    sk.update_i32(a, a_keys)
    sk.update_i32(b, b_keys)
    both = sk.intersect(a, b)
    inter = np.arange(5000, 8000, dtype=np.int32)
    assert sk.contains_i32(both, inter).all()  # zero FN on the intersection
    probe = np.arange(0, 20000, dtype=np.int32)
    m_and = sk.contains_i32(both, probe)
    assert (m_and <= sk.contains_i32(a, probe)).all()  # subset of A's members
    assert (m_and <= sk.contains_i32(b, probe)).all()  # subset of B's members
    # exclusive keys false-positive only at a bounded rate
    excl = np.arange(0, 5000, dtype=np.int32)
    assert sk.contains_i32(both, excl).mean() <= 0.05

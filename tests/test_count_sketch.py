"""Count-Sketch kernel tests — unbiased point estimates, AMS F2,
merge bit-equality under permuted order, serde round-trip, sign balance.

Mirrors the reference's test discipline for its filters
(/root/reference/filter/bloom/filter_test.go:134-185: inserted-key
invariants + bounded error on foreign probes), applied to the signed
frequency sketch the reference lacks.
"""

import itertools

import numpy as np
import pytest

from bloom_filter_spark.sketches import CountSketch, CountSketchParams


def _zipf_batch(n=200_000, seed=7):
    rng = np.random.default_rng(seed)
    v = rng.zipf(1.3, n).astype(np.int32)
    return v[v < 50_000]


def test_point_estimates_within_f2_bound_and_unbiased():
    vals = _zipf_batch()
    sk = CountSketch(CountSketchParams(w=1 << 15, d=5))
    st = sk.empty()
    sk.update_i32(st, vals)
    u, c = np.unique(vals, return_counts=True)
    est = sk.point_i32(st, u)
    err = est - c
    f2 = float((c.astype(np.float64) ** 2).sum())
    # per-row std ≤ sqrt(F2/w); 6σ on the 5-row median never fires
    assert np.abs(err).max() <= 6 * np.sqrt(f2 / sk.params.w)
    # unbiasedness shows as near-zero mean error (CMS would be all ≥ 0)
    assert abs(float(err.mean())) < 1.0
    assert (err < 0).any() and (err > 0).any()


def test_absent_keys_estimate_near_zero():
    vals = _zipf_batch()
    sk = CountSketch(CountSketchParams(w=1 << 15, d=5))
    st = sk.empty()
    sk.update_i32(st, vals)
    absent = np.arange(1_000_000, 1_010_000, dtype=np.int64)
    est = sk.point_i64(st, absent)
    c = np.unique(vals, return_counts=True)[1]
    f2 = float((c.astype(np.float64) ** 2).sum())
    assert np.abs(est).max() <= 6 * np.sqrt(f2 / sk.params.w)


def test_f2_estimate_within_bound():
    vals = _zipf_batch()
    sk = CountSketch(CountSketchParams(w=1 << 15, d=5))
    st = sk.empty()
    sk.update_i32(st, vals)
    c = np.unique(vals, return_counts=True)[1]
    f2 = float((c.astype(np.float64) ** 2).sum())
    # per-row variance ≤ 2·F2²/w → 6σ median bound
    assert abs(sk.f2_estimate(st) - f2) <= 6 * f2 * np.sqrt(2 / sk.params.w)


def test_merge_bit_identical_any_order():
    vals = _zipf_batch()
    sk = CountSketch(CountSketchParams(w=1 << 12, d=3))
    whole = sk.empty()
    sk.update_i32(whole, vals)
    parts = []
    for lo in range(0, len(vals), len(vals) // 4 + 1):
        st = sk.empty()
        sk.update_i32(st, vals[lo:lo + len(vals) // 4 + 1])
        parts.append(st)
    for perm in itertools.permutations(range(len(parts))):
        acc = sk.empty()
        for i in perm:
            acc = sk.merge(acc, parts[i])
        assert np.array_equal(acc, whole)


def test_serde_round_trip_and_weighted_str_updates():
    sk = CountSketch(CountSketchParams(w=1 << 10, d=5, seed=12345))
    st = sk.empty()
    sk.update_str(st, ["alpha", "beta", "alpha", ""], weights=[2, 3, 1, 7])
    sk2, st2 = CountSketch.deserialize(sk.serialize(st))
    assert sk2.params.w == 1 << 10 and sk2.params.d == 5
    assert sk2.params.seed == 12345
    assert np.array_equal(st2, st)
    assert int(sk.point_str(st2, ["alpha"])[0]) == 3
    assert int(sk.point_str(st2, ["beta"])[0]) == 3


def test_d_forced_odd_for_integer_median():
    assert CountSketchParams(d=4).d == 5
    assert CountSketchParams(d=5).d == 5
    with pytest.raises(ValueError):
        CountSketchParams(w=1)


def test_signs_balanced():
    # the ±1 hash family must be near-balanced or estimates bias
    sk = CountSketch(CountSketchParams(w=1 << 10, d=5))
    keys = np.arange(100_000, dtype=np.int32)
    _, hs = sk._hashes(keys, "i32")
    for j in range(sk.params.d):
        frac = (sk._signs(hs, j) > 0).mean()
        assert 0.49 < frac < 0.51


def test_weighted_updates_exact_past_float53():
    """Weighted accumulation must stay int64-exact: two 2^53+1 weights on
    the same key differ from 2^54+2 by exactly 0 in int64 but by 2 under
    float64 rounding (ADVICE r5 — the old float-bincount path lost this)."""
    sk = CountSketch(CountSketchParams(w=1 << 8, d=3))
    big = (1 << 53) + 1
    a = sk.empty()
    sk.update_i64(a, np.array([42, 42], np.int64),
                  np.array([big, big], np.int64))
    b = sk.empty()
    sk.update_i64(b, np.array([42], np.int64),
                  np.array([2 * big], np.int64))
    assert np.array_equal(a, b)
    assert int(sk.point_i64(a, np.array([42], np.int64))[0]) == 2 * big


def test_deserialize_rejects_corrupt_params():
    """A blob with an even d (or degenerate w) must be rejected, not
    silently accepted with a biased upper-median point query (ADVICE r5)."""
    sk = CountSketch(CountSketchParams(w=1 << 6, d=3))
    st = sk.empty()
    sk.update_i32(st, np.arange(100, dtype=np.int32))
    blob = bytearray(sk.serialize(st))
    good = CountSketch.deserialize(bytes(blob))
    assert good[0].params == sk.params
    blob[0:4] = (4).to_bytes(4, "little")          # d=4: even
    with pytest.raises(ValueError):
        CountSketch.deserialize(bytes(blob))
    blob[0:4] = (0).to_bytes(4, "little")          # d=0
    with pytest.raises(ValueError):
        CountSketch.deserialize(bytes(blob))
    blob[0:4] = (3).to_bytes(4, "little")
    blob[4:8] = (1).to_bytes(4, "little")          # w=1: degenerate
    with pytest.raises(ValueError):
        CountSketch.deserialize(bytes(blob))

"""MetroHash64 parity tests.

Vectorized kernels (bloom_filter_spark/core/metro.py) vs (a) the published
metrohash 63-byte test vector for seeds 0 and 1 and (b) an INDEPENDENT
scalar big-int implementation on random keys of every length 0-100.  Then a
cuckoo blob is built exactly as the Go reference would (Insert order, first-
empty-slot fill, LE layout — /root/reference/filter/cuckoo/filter.go) at low
load (no evictions, hence deterministic) and probed/deleted through the
engine with hash_family="metro".
"""

import numpy as np
import pytest

from bloom_filter_spark.core import metro

M64 = (1 << 64) - 1
K0, K1, K2, K3 = 0xD6D018F5, 0xA2AA033B, 0x62992FC1, 0x30BC5B29


def _rotr(x, n):
    return ((x >> n) | (x << (64 - n))) & M64


def scalar_metro64(data: bytes, seed: int = 0) -> int:
    n, p = len(data), 0
    h = ((seed + K2) * K0) & M64

    def r(o, k):
        return int.from_bytes(data[o:o + k], "little")

    if n >= 32:
        v = [h, h, h, h]
        while n - p >= 32:
            v[0] = (_rotr((v[0] + r(p, 8) * K0) & M64, 29) + v[2]) & M64
            v[1] = (_rotr((v[1] + r(p + 8, 8) * K1) & M64, 29) + v[3]) & M64
            v[2] = (_rotr((v[2] + r(p + 16, 8) * K2) & M64, 29) + v[0]) & M64
            v[3] = (_rotr((v[3] + r(p + 24, 8) * K3) & M64, 29) + v[1]) & M64
            p += 32
        v[2] ^= (_rotr(((v[0] + v[3]) * K0 + v[1]) & M64, 37) * K1) & M64
        v[3] ^= (_rotr(((v[1] + v[2]) * K1 + v[0]) & M64, 37) * K0) & M64
        v[0] ^= (_rotr(((v[0] + v[2]) * K0 + v[3]) & M64, 37) * K1) & M64
        v[1] ^= (_rotr(((v[1] + v[3]) * K1 + v[2]) & M64, 37) * K0) & M64
        h = (h + (v[0] ^ v[1])) & M64
    if n - p >= 16:
        w0 = (_rotr((h + r(p, 8) * K2) & M64, 29) * K3) & M64
        w1 = (_rotr((h + r(p + 8, 8) * K2) & M64, 29) * K3) & M64
        w0 = (w0 ^ ((_rotr((w0 * K0) & M64, 21) + w1) & M64))
        w1 = (w1 ^ ((_rotr((w1 * K3) & M64, 21) + w0) & M64))
        h = (h + w1) & M64
        p += 16
    for nbytes, rot in ((8, 55), (4, 26), (2, 48), (1, 37)):
        if n - p >= nbytes:
            h = (h + r(p, nbytes) * K3) & M64
            h ^= (_rotr(h, rot) * K1) & M64
            p += nbytes
    h ^= _rotr(h, 28)
    h = (h * K0) & M64
    h ^= _rotr(h, 29)
    return h


TEST_KEY = b"012345678901234567890123456789012345678901234567890123456789012"


def test_published_vectors():
    # upstream README prints these as byte sequences (6B753DAE06704BAD /
    # 3B0D481CF4B9B8DF); as returned little-endian uint64s they are:
    assert metro.metro64(TEST_KEY, 0) == 0xAD4B7006AE3D756B
    assert metro.metro64(TEST_KEY, 1) == 0xDFB8B9F41C480D3B
    assert scalar_metro64(TEST_KEY, 0) == 0xAD4B7006AE3D756B
    assert scalar_metro64(TEST_KEY, 1) == 0xDFB8B9F41C480D3B


def test_vectorized_matches_scalar_all_lengths():
    rng = np.random.default_rng(31)
    keys = [bytes(rng.integers(0, 256, ln, dtype=np.uint8))
            for ln in range(0, 101) for _ in range(4)]
    for seed in (0, 7, 0xDEADBEEF):
        got = metro.metro64_bytes(keys, seed=seed)
        for k, g in zip(keys, got):
            assert int(g) == scalar_metro64(k, seed), (len(k), seed)


def test_int_fast_paths_match_bytes_path():
    rng = np.random.default_rng(37)
    i32 = rng.integers(-(1 << 31), 1 << 31, 300, dtype=np.int32)
    i64 = rng.integers(-(1 << 63), 1 << 63, 300, dtype=np.int64)
    for seed in (0, 99):
        np.testing.assert_array_equal(
            metro.metro64_i32(i32, seed),
            metro.metro64_bytes(
                [int(np.uint32(v)).to_bytes(4, "little") for v in i32], seed))
        np.testing.assert_array_equal(
            metro.metro64_i64(i64, seed),
            metro.metro64_bytes(
                [int(np.uint64(v)).to_bytes(8, "little") for v in i64], seed))


def _go_cuckoo_blob(keys, m, seed, fp_seed):
    """Simulate the Go reference's Insert loop (first-empty-slot fill,
    filter.go:39-66,126-134) at low load so no evictions occur, then its
    Serialize layout (u32 M | u64 FpSeed | u64 Seed | M x 4 bytes)."""
    buckets = [[0, 0, 0, 0] for _ in range(m)]

    def bucket_insert(fp, h):
        for i in range(4):
            if buckets[h][i] == 0:
                buckets[h][i] = fp
                return True
        return False

    for key in keys:
        h = scalar_metro64(key, seed)
        h1 = (h >> 32) & (m - 1)
        fp = h & 0xFF
        if fp == 0:
            fp = 1
        if bucket_insert(fp, h1):
            continue
        alt = h1 ^ ((scalar_metro64(bytes([fp]), fp_seed) >> 32) & (m - 1))
        assert bucket_insert(fp, alt), "fixture too loaded; eviction nondeterminism"
    out = m.to_bytes(4, "little") + fp_seed.to_bytes(8, "little") \
        + seed.to_bytes(8, "little")
    for b in buckets:
        out += bytes(b)
    return out


def test_go_built_cuckoo_probes_and_deletes():
    from bloom_filter_spark.sketches.cuckoo import CuckooFilter
    rng = np.random.default_rng(41)
    keys = [bytes(rng.integers(0, 256, int(ln), dtype=np.uint8))
            for ln in rng.integers(4, 24, 1500)]
    keys = list(dict.fromkeys(keys))  # unique, order-preserving
    m = 2048  # load ~0.18: no evictions, deterministic layout
    blob = _go_cuckoo_blob(keys, m, seed=0xDEAD_0001, fp_seed=0xBEEF_0002)
    cf, state = CuckooFilter.deserialize(blob, hash_family="metro")
    assert cf.params.hash_family == "metro"
    member = cf.contains_str(state, keys)
    assert member.all(), "zero false negatives required on Go-built cuckoo"
    # our serializer reproduces the Go bytes exactly
    assert cf.serialize(state) == blob
    # delete the first half through OUR engine; the rest must stay present
    half = len(keys) // 2
    removed = cf.delete_str(state, keys[:half])
    assert removed.all(), "every Go-inserted key must be deletable"
    assert cf.contains_str(state, keys[half:]).all()


def test_engine_metro_insert_matches_go_layout():
    """Engine-side insert in metro mode lands every fingerprint in a bucket
    the Go Lookup would check (h1 or alt) — cross-build probe compatibility
    in the other direction."""
    from bloom_filter_spark.sketches.cuckoo import CuckooFilter, CuckooParams
    rng = np.random.default_rng(43)
    keys = [bytes(rng.integers(0, 256, 12, dtype=np.uint8)) for _ in range(900)]
    keys = list(dict.fromkeys(keys))
    p = CuckooParams(n=4096, load_factor=0.8, seed=0xDEAD_0001,
                     fp_seed=0xBEEF_0002, hash_family="metro")
    cf = CuckooFilter(p)
    st = cf.empty()
    failed = cf.insert_str(st, keys, rng_seed=5)
    assert failed == 0
    for key in keys:  # Go-side Lookup simulation over our state
        h = scalar_metro64(key, p.seed)
        h1 = (h >> 32) & (p.m - 1)
        fp = h & 0xFF or 1
        alt = h1 ^ ((scalar_metro64(bytes([fp]), p.fp_seed) >> 32) & (p.m - 1))
        assert fp in st[h1] or fp in st[alt]

"""XXH3-64 parity tests.

The vectorized kernels (bloom_filter_spark/core/xxh3.py) are checked against
(a) the four published xxHash sanity vectors (xsum_sanity_check.c seed-0
test buffer) and (b) an INDEPENDENT scalar big-int implementation written
here — different arithmetic (Python ints vs numpy wrapping uint64), same
spec.  Finally a Bloom blob is built exactly the way the Go reference
serializes one (/root/reference/filter/bloom/filter.go:23-29,63-75: sizing,
DoubleHash index expansion, LE layout) using the scalar hash and a pure-
Python bit loop, then probed through the vectorized engine path with
hash_family="xxh3" — zero false negatives proves a Go-built filter is
probe-compatible for ≤16-byte keys (all int32/int64 tokens).
"""

import math

import numpy as np
import pytest

from bloom_filter_spark.core import xxh3

M64 = (1 << 64) - 1
SECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e")


def _r32(b, o):
    return int.from_bytes(b[o:o + 4], "little")


def _r64(b, o):
    return int.from_bytes(b[o:o + 8], "little")


def _rotl(x, n):
    return ((x << n) | (x >> (64 - n))) & M64


def _xxh64_ava(h):
    h &= M64
    h ^= h >> 33
    h = (h * 0xC2B2AE3D27D4EB4F) & M64
    h ^= h >> 29
    h = (h * 0x165667B19E3779F9) & M64
    h ^= h >> 32
    return h


def _xxh3_ava(h):
    h &= M64
    h ^= h >> 37
    h = (h * 0x165667919E3779F9) & M64
    h ^= h >> 32
    return h


def scalar_xxh3_64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    if n == 0:
        return _xxh64_ava(seed ^ _r64(SECRET, 56) ^ _r64(SECRET, 64))
    if n <= 3:
        c1, c2, c3 = data[0], data[n >> 1], data[n - 1]
        combined = ((c1 << 16) | (c2 << 24) | c3 | (n << 8)) & 0xFFFFFFFF
        return _xxh64_ava(combined ^ ((_r32(SECRET, 0) ^ _r32(SECRET, 4)) + seed))
    if n <= 8:
        s = (seed ^ (int.from_bytes((seed & 0xFFFFFFFF).to_bytes(4, "little"),
                                    "big") << 32)) & M64
        in1, in2 = _r32(data, 0), _r32(data, n - 4)
        x = ((in2 + (in1 << 32)) & M64) ^ ((_r64(SECRET, 8) ^ _r64(SECRET, 16)) - s) & M64
        x ^= _rotl(x, 49) ^ _rotl(x, 24)
        x = (x * 0x9FB21C651E98DF25) & M64
        x ^= ((x >> 35) + n) & M64
        x &= M64
        x = (x * 0x9FB21C651E98DF25) & M64
        return x ^ (x >> 28)
    if n <= 16:
        bf1 = ((_r64(SECRET, 24) ^ _r64(SECRET, 32)) + seed) & M64
        bf2 = ((_r64(SECRET, 40) ^ _r64(SECRET, 48)) - seed) & M64
        lo = _r64(data, 0) ^ bf1
        hi = _r64(data, n - 8) ^ bf2
        prod = lo * hi
        fold = ((prod & M64) ^ (prod >> 64)) & M64
        swapped = int.from_bytes(lo.to_bytes(8, "little"), "big")
        return _xxh3_ava((n + swapped + hi + fold) & M64)
    if n <= 128:
        def mix16(off, soff):
            a = _r64(data, off) ^ ((_r64(SECRET, soff) + seed) & M64)
            b = _r64(data, off + 8) ^ ((_r64(SECRET, soff + 8) - seed) & M64)
            prod = a * b
            return ((prod & M64) ^ (prod >> 64)) & M64
        acc = (n * 0x9E3779B185EBCA87) & M64
        if n > 32:
            if n > 64:
                if n > 96:
                    acc = (acc + mix16(48, 96)) & M64
                    acc = (acc + mix16(n - 64, 112)) & M64
                acc = (acc + mix16(32, 64)) & M64
                acc = (acc + mix16(n - 48, 80)) & M64
            acc = (acc + mix16(16, 32)) & M64
            acc = (acc + mix16(n - 32, 48)) & M64
        acc = (acc + mix16(0, 0)) & M64
        acc = (acc + mix16(n - 16, 16)) & M64
        return _xxh3_ava(acc)
    raise NotImplementedError


SANITY = {0: 0x2D06800538D394C2, 1: 0xC44BDFF4074EECDB,
          6: 0x27B56A84CD2D7325, 12: 0xA713DAF0DFBB77E7,
          24: 0xA3FE70BF9D3510EB, 48: 0x397DA259ECBA1F11}


def _sanity_buffer(n=64):
    buf, g = bytearray(), 2654435761
    for _ in range(n):
        buf.append((g >> 56) & 0xFF)
        g = (g * 11400714785074694797) & M64
    return bytes(buf)


def test_published_sanity_vectors():
    buf = _sanity_buffer()
    for ln, want in SANITY.items():
        assert xxh3.xxh3_64(buf[:ln]) == want
        assert scalar_xxh3_64(buf[:ln]) == want


def test_vectorized_i32_matches_scalar():
    rng = np.random.default_rng(7)
    vals = rng.integers(-(1 << 31), 1 << 31, 500, dtype=np.int32)
    got = xxh3.xxh3_64_i32(vals)
    for v, g in zip(vals, got):
        assert int(g) == scalar_xxh3_64(int(np.uint32(np.int32(v))).to_bytes(4, "little"))


def test_vectorized_i64_matches_scalar():
    rng = np.random.default_rng(8)
    vals = rng.integers(-(1 << 63), 1 << 63, 500, dtype=np.int64)
    got = xxh3.xxh3_64_i64(vals)
    for v, g in zip(vals, got):
        assert int(g) == scalar_xxh3_64(int(np.uint64(np.int64(v))).to_bytes(8, "little"))


def test_vectorized_bytes_all_lengths_match_scalar():
    rng = np.random.default_rng(9)
    keys = []
    for ln in range(0, 129):
        for _ in range(6):
            keys.append(bytes(rng.integers(0, 256, ln, dtype=np.uint8)))
    keys.append(b"a\x00")          # trailing NUL stays distinct
    keys.append(b"a")
    for seed in (0, 42, 0xDEADBEEF):
        got = xxh3.xxh3_64_bytes(keys, seed=seed)
        for k, g in zip(keys, got):
            assert int(g) == scalar_xxh3_64(k, seed), (k, seed)
    assert xxh3.xxh3_64(b"a\x00") != xxh3.xxh3_64(b"a")


def test_bytes_over_128_raises():
    with pytest.raises(NotImplementedError):
        xxh3.xxh3_64_bytes([b"x" * 129])


def _go_reference_bloom_blob(keys_i32, n, p):
    """Byte-for-byte what the Go reference would serialize: sizing from
    filter.go:23-29, DoubleHash expansion hash.go:5-14, layout
    filter.go:63-75 (LE u32 M | u32 K | u64 Seed | words x u64) — built with
    the independent scalar hash and pure-Python bit ops."""
    ln2 = math.log(2.0)
    m_pre = math.ceil(-n * math.log(p) / (ln2 * ln2))
    k = max(1, round((m_pre / n) * ln2))
    m = 1 << (m_pre - 1).bit_length()
    words = [0] * ((m >> 6) + 1)
    for key in keys_i32:
        h = scalar_xxh3_64(int(np.uint32(np.int32(key))).to_bytes(4, "little"))
        h1, h2 = h & 0xFFFFFFFF, h >> 32
        for i in range(k):
            idx = (h1 + i * h2) & (m - 1)
            words[idx >> 6] |= 1 << (idx & 63)
    out = m.to_bytes(4, "little") + k.to_bytes(4, "little")
    out += (0).to_bytes(8, "little")  # Go zero-value Seed (never hashed, Q1)
    for w in words:
        out += w.to_bytes(8, "little")
    return out


def test_go_built_filter_probes_with_zero_fn():
    from bloom_filter_spark.sketches import BloomSketch
    rng = np.random.default_rng(13)
    present = rng.choice(1 << 20, 4000, replace=False).astype(np.int32)
    blob = _go_reference_bloom_blob(present, n=4096, p=0.01)
    sk, state = BloomSketch.deserialize(blob, hash_family="xxh3")
    assert sk.params.hash_family == "xxh3"
    member = sk.contains_i32(state, present)
    assert member.all(), "zero false negatives required on a Go-built filter"
    absent = (np.arange(5000, dtype=np.int32) + (1 << 21))
    fpr = sk.contains_i32(state, absent).mean()
    assert fpr <= 0.02, f"FPR {fpr} on Go-built filter exceeds 2x configured p"
    # round-trip: our serializer reproduces the Go bytes exactly
    assert sk.serialize(state) == blob


def test_engine_xxh3_build_equals_go_build():
    """Building with hash_family='xxh3' from scratch produces the identical
    byte blob the Go reference would — full build-side parity, not just
    probe-side."""
    from bloom_filter_spark.sketches import BloomParams, BloomSketch
    rng = np.random.default_rng(14)
    present = rng.choice(1 << 20, 3000, replace=False).astype(np.int32)
    go_blob = _go_reference_bloom_blob(present, n=4096, p=0.01)
    sk = BloomSketch(BloomParams(n=4096, p=0.01, seed=0, hash_family="xxh3"))
    st = sk.empty()
    sk.update_i32(st, present)
    assert sk.serialize(st) == go_blob

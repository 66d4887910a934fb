"""XXH3-128 parity tests (verdict r2 next-round #7).

The vectorized 128-bit digest (core/xxh3.py) is checked against (a) the
published XXH128 sanity vectors and (b) an independent scalar big-int twin
transcribed from the published spec, then a blocked-Bloom word array is
built with pure-Python Go semantics
(/root/reference/filter/blocked-bloom/filter.go:25-52: sizing, Hash128.Lo
block select, Hi double-hash, 1<<bit set) and compared word-for-word with
the engine's hash_family="xxh3" build — the engine-side serde fills the
role of the blob (the reference has no blocked-bloom serializer).
"""

import math

import numpy as np

from bloom_filter_spark.core import xxh3
from tests.test_xxh3 import (M64, SECRET, _r32, _r64, _sanity_buffer,
                             _xxh3_ava, _xxh64_ava, scalar_xxh3_64)


def _mul128(a, b):
    prod = a * b
    return prod & M64, prod >> 64


def scalar_xxh3_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    n = len(data)
    if n == 0:
        return (_xxh64_ava(seed ^ _r64(SECRET, 64) ^ _r64(SECRET, 72)),
                _xxh64_ava(seed ^ _r64(SECRET, 80) ^ _r64(SECRET, 88)))
    if n <= 3:
        c1, c2, c3 = data[0], data[n >> 1], data[n - 1]
        combl = ((c1 << 16) | (c2 << 24) | c3 | (n << 8)) & 0xFFFFFFFF
        swapped = int.from_bytes(combl.to_bytes(4, "little"), "big")
        combh = ((swapped << 13) | (swapped >> 19)) & 0xFFFFFFFF
        bfl = ((_r32(SECRET, 0) ^ _r32(SECRET, 4)) + seed) & M64
        bfh = ((_r32(SECRET, 8) ^ _r32(SECRET, 12)) - seed) & M64
        return _xxh64_ava(combl ^ bfl), _xxh64_ava(combh ^ bfh)
    if n <= 8:
        s = (seed ^ (int.from_bytes((seed & 0xFFFFFFFF).to_bytes(4, "little"),
                                    "big") << 32)) & M64
        inp = _r32(data, 0) + (_r32(data, n - 4) << 32)
        keyed = inp ^ (((_r64(SECRET, 16) ^ _r64(SECRET, 24)) + s) & M64)
        lo, hi = _mul128(keyed, (0x9E3779B185EBCA87 + (n << 2)) & M64)
        hi = (hi + ((lo << 1) & M64)) & M64
        lo ^= hi >> 3
        lo ^= lo >> 35
        lo = (lo * 0x9FB21C651E98DF25) & M64
        lo ^= lo >> 28
        return lo, _xxh3_ava(hi)
    if n <= 16:
        bfl = ((_r64(SECRET, 32) ^ _r64(SECRET, 40)) - seed) & M64
        bfh = ((_r64(SECRET, 48) ^ _r64(SECRET, 56)) + seed) & M64
        in_lo, in_hi = _r64(data, 0), _r64(data, n - 8)
        mlo, mhi = _mul128(in_lo ^ in_hi ^ bfl, 0x9E3779B185EBCA87)
        mlo = (mlo + ((n - 1) << 54)) & M64
        in_hi ^= bfh
        mhi = (mhi + in_hi
               + (in_hi & 0xFFFFFFFF) * (0x85EBCA77 - 1)) & M64
        mlo ^= int.from_bytes(mhi.to_bytes(8, "little"), "big")
        hlo, hhi = _mul128(mlo, 0xC2B2AE3D27D4EB4F)
        hhi = (hhi + mhi * 0xC2B2AE3D27D4EB4F) & M64
        return _xxh3_ava(hlo), _xxh3_ava(hhi)

    def mix16(off, soff, sd):
        a = _r64(data, off) ^ ((_r64(SECRET, soff) + sd) & M64)
        b = _r64(data, off + 8) ^ ((_r64(SECRET, soff + 8) - sd) & M64)
        prod = a * b
        return ((prod & M64) ^ (prod >> 64)) & M64

    def mix32(accl, acch, off1, off2, soff, sd):
        accl = (accl + mix16(off1, soff, sd)) & M64
        accl ^= (_r64(data, off2) + _r64(data, off2 + 8)) & M64
        acch = (acch + mix16(off2, soff + 16, sd)) & M64
        acch ^= (_r64(data, off1) + _r64(data, off1 + 8)) & M64
        return accl, acch

    def final(accl, acch):
        lo = _xxh3_ava((accl + acch) & M64)
        hi = (accl * 0x9E3779B185EBCA87 + acch * 0x85EBCA77C2B2AE63
              + ((n - seed) & M64) * 0xC2B2AE3D27D4EB4F) & M64
        return lo, (0 - _xxh3_ava(hi)) & M64

    if n <= 128:
        accl = (n * 0x9E3779B185EBCA87) & M64
        acch = 0
        for i in range((n - 1) // 32, -1, -1):
            accl, acch = mix32(accl, acch, 16 * i, n - 16 * (i + 1),
                               32 * i, seed)
        return final(accl, acch)
    if n <= 240:
        accl = (n * 0x9E3779B185EBCA87) & M64
        acch = 0
        for i in range(4):
            accl, acch = mix32(accl, acch, 32 * i, 32 * i + 16, 32 * i, seed)
        accl, acch = _xxh3_ava(accl), _xxh3_ava(acch)
        for i in range(4, n // 32):
            accl, acch = mix32(accl, acch, 32 * i, 32 * i + 16,
                               3 + 32 * (i - 4), seed)
        accl, acch = mix32(accl, acch, n - 16, n - 32, 103, (0 - seed) & M64)
        return final(accl, acch)
    # > 240: shared accumulator, two mergeAccs
    if seed:
        sec = b"".join(
            (((_r64(SECRET, 16 * i) + seed) & M64).to_bytes(8, "little")
             + ((_r64(SECRET, 16 * i + 8) - seed) & M64).to_bytes(8, "little"))
            for i in range(12))
    else:
        sec = SECRET
    acc = [0xC2B2AE3D, 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
           0x165667B19E3779F9, 0x85EBCA77C2B2AE63, 0x85EBCA77,
           0x27D4EB2F165667C5, 0x9E3779B1]

    def stripe(doff, soff):
        for i in range(8):
            dv = _r64(data, doff + 8 * i)
            dk = dv ^ _r64(sec, soff + 8 * i)
            acc[i ^ 1] = (acc[i ^ 1] + dv) & M64
            acc[i] = (acc[i] + (dk & 0xFFFFFFFF) * (dk >> 32)) & M64

    nb = (n - 1) // 1024
    for b in range(nb):
        for s_ in range(16):
            stripe(b * 1024 + 64 * s_, 8 * s_)
        for i in range(8):
            a = acc[i]
            a ^= a >> 47
            a ^= _r64(sec, 128 + 8 * i)
            acc[i] = (a * 0x9E3779B1) & M64
    for s_ in range(((n - 1) - nb * 1024) // 64):
        stripe(nb * 1024 + 64 * s_, 8 * s_)
    stripe(n - 64, 192 - 64 - 7)

    def merge(soff, start):
        res = start
        for i in range(4):
            a = acc[2 * i] ^ _r64(sec, soff + 16 * i)
            b = acc[2 * i + 1] ^ _r64(sec, soff + 16 * i + 8)
            prod = a * b
            res = (res + (((prod & M64) ^ (prod >> 64)) & M64)) & M64
        return _xxh3_ava(res)

    return (merge(11, (n * 0x9E3779B185EBCA87) & M64),
            merge(192 - 64 - 11, (n * 0xC2B2AE3D27D4EB4F) & M64 ^ M64))


# Published XXH128 sanity vectors, seed 0: (low64, high64).  Rows cover
# empty / 1-3 / 9-16 / 17-32 (24) / 33-64 (48) / 65-96 (81) / 129-240
# (222) / >240 partial (403, 512) / >240 full block + scramble (2048).
# For >240 low64 must equal XXH3-64 of the same input (shared mergeAccs) —
# 403/512/2048 lows match tests/test_xxh3.py's 64-bit table.
SANITY_128 = {
    0: (0x6001C324468D497F, 0x99AA06D3014798D8),
    1: (0xC44BDFF4074EECDB, 0xA6CD5E9392000F6A),
    6: (0x3E7039BDDA43CFC6, 0x082AFE0B8162D12A),
    12: (0x061A192713F69AD9, 0x6E3EFD8FC7802B18),
    24: (0x1E7044D28B1B901D, 0x0CE966E4678D3761),
    48: (0xF942219AED80F67B, 0xA002AC4E5478227E),
    81: (0x5E8BAFB9F95FB803, 0x4952F58181AB0042),
    222: (0xF1AEBD597CEC6B3A, 0x337E09641B948717),
    403: (0xCDEB804D65C6DEA4, 0x1B6DE21E332DD73D),
    512: (0x617E49599013CB6B, 0x18D2D110DCC9BCA1),
    2048: (0xDD59E2C3A5F038E0, 0xF736557FD47073A5),
}


def test_published_128_sanity_vectors():
    buf = _sanity_buffer()
    for ln, (wl, wh) in SANITY_128.items():
        assert xxh3.xxh3_128(buf[:ln]) == (wl, wh), ln
        assert scalar_xxh3_128(buf[:ln]) == (wl, wh), ln


def test_published_128_len6_seeded_vector_pins_4to8_orientation():
    """The 4-8 length class's (lo, hi) orientation, pinned by published
    sanity vectors at BOTH standard sanity seeds.  The seeded row is the
    strong one: seed=PRIME32 exercises the class-specific
    ``seed ^= swap32((u32)seed) << 32`` fold, so low/high agreeing with the
    published (low64, high64) pair at two seeds fixes the orientation —
    a swapped assignment would fail both rows."""
    buf = _sanity_buffer()
    PRIME32 = 2654435761
    assert xxh3.xxh3_128(buf[:6], 0) == \
        (0x3E7039BDDA43CFC6, 0x082AFE0B8162D12A)
    assert xxh3.xxh3_128(buf[:6], PRIME32) == \
        (0x269D8F70BE98856E, 0x5A865B5389ABD2B1)
    assert scalar_xxh3_128(buf[:6], PRIME32) == \
        (0x269D8F70BE98856E, 0x5A865B5389ABD2B1)


def test_128_len_4to8_derivation_all_lengths_and_seeds():
    """Spec-derivation twin over the WHOLE 4-8 class: for every length
    4..8 and a seed sweep that flips the swap32 fold's interesting bits
    (0, small, high-bit, sign-asymmetric), a pure big-int evaluation of the
    published formula — one expression per step, no numpy limbs — must
    agree with the vectorized implementation, and the int32/int64 fast
    paths must equal the byte path of the same LE pattern."""
    rng = np.random.default_rng(77)
    seeds = [0, 1, 2654435761, 0x9E3779B185EBCA87, 0xFFFFFFFF00000001]
    for ln in (4, 5, 6, 7, 8):
        keys = [bytes(rng.integers(0, 256, ln, dtype=np.uint8))
                for _ in range(8)]
        for seed in seeds:
            want = [scalar_xxh3_128(k, seed) for k in keys]
            lo, hi = xxh3.xxh3_128_bytes(keys, seed)
            assert [(int(a), int(b)) for a, b in zip(lo, hi)] == want, \
                (ln, seed)
    # fast-path orientation: i32/i64 vectors == byte path of LE patterns
    vals32 = rng.integers(-2**31, 2**31, 64, dtype=np.int32)
    vals64 = rng.integers(-2**63, 2**63, 64, dtype=np.int64)
    for seed in seeds:
        bl, bh = xxh3.xxh3_128_bytes(
            [int(v).to_bytes(4, "little", signed=True) for v in vals32], seed)
        il, ih = xxh3.xxh3_128_i32(vals32, seed)
        assert (bl == il).all() and (bh == ih).all(), seed
        bl, bh = xxh3.xxh3_128_bytes(
            [int(v).to_bytes(8, "little", signed=True) for v in vals64], seed)
        il, ih = xxh3.xxh3_128_i64(vals64, seed)
        assert (bl == il).all() and (bh == ih).all(), seed


def test_128_long_low_equals_64():
    """Spec property: for len > 240 the 128-bit low word IS XXH3-64 (same
    accumulators, same mergeAccs start) — ties the two implementations."""
    buf = _sanity_buffer()
    for ln in (241, 403, 512, 1024, 1025, 2048, 2367):
        lo, _ = xxh3.xxh3_128(buf[:ln])
        assert lo == int(xxh3.xxh3_64_bytes([buf[:ln]])[0]), ln


def test_vectorized_128_matches_scalar_all_lengths():
    rng = np.random.default_rng(21)
    keys = []
    for ln in list(range(0, 130)) + [160, 240, 241, 512, 999, 1024, 1025, 2048]:
        keys.append(bytes(rng.integers(0, 256, ln, dtype=np.uint8)))
    for seed in (0, 42):
        lo, hi = xxh3.xxh3_128_bytes(keys, seed=seed)
        for k, gl, gh in zip(keys, lo, hi):
            assert (int(gl), int(gh)) == scalar_xxh3_128(k, seed), (len(k), seed)


def test_128_i32_i64_fast_paths():
    rng = np.random.default_rng(22)
    v32 = rng.integers(-(1 << 31), 1 << 31, 300, dtype=np.int32)
    lo, hi = xxh3.xxh3_128_i32(v32)
    for v, gl, gh in zip(v32, lo, hi):
        b = int(np.uint32(np.int32(v))).to_bytes(4, "little")
        assert (int(gl), int(gh)) == scalar_xxh3_128(b)
    v64 = rng.integers(-(1 << 63), 1 << 63, 300, dtype=np.int64)
    lo, hi = xxh3.xxh3_128_i64(v64)
    for v, gl, gh in zip(v64, lo, hi):
        b = int(np.uint64(np.int64(v))).to_bytes(8, "little")
        assert (int(gl), int(gh)) == scalar_xxh3_128(b)


def _go_blocked_bloom_words(keys, n, p):
    """Pure-Python Go-semantics blocked bloom (filter.go:25-52)."""
    ln2 = math.log(2.0)
    m_pre = math.ceil(-n * math.log(p) / (ln2 * ln2))
    m = max(1 << (m_pre - 1).bit_length(), 256)
    block_count = m // 256
    words = [0] * (m >> 6)
    for key in keys:
        lo, hi = scalar_xxh3_128(key)
        block = lo & (block_count - 1)
        block_off = block * 4
        h1, h2 = hi, hi >> 32
        for i in range(4):
            bit = (h1 + i * h2) & 255
            words[block_off + (bit >> 6)] |= 1 << (bit & 63)
    return words


def test_blocked_bloom_xxh3_matches_go_bit_placement():
    """hash_family='xxh3' blocked bloom lands EXACTLY the Go bit pattern
    over the reference demo's own key shape (strings 0-999 bytes), and the
    engine serde round-trips it (engine-side blob — the reference has no
    blocked-bloom serializer, SURVEY.md §2.2)."""
    from bloom_filter_spark.sketches import BlockedBloomParams, BlockedBloomSketch
    rng = np.random.default_rng(23)
    alphabet = np.frombuffer(
        b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
        np.uint8)
    keys = [bytes(alphabet[rng.integers(0, 62, int(ln))])
            for ln in rng.integers(0, 1000, 400)]
    keys = list(dict.fromkeys(keys))
    go_words = _go_blocked_bloom_words(keys, n=1000, p=0.01)
    sk = BlockedBloomSketch(BlockedBloomParams(n=1000, p=0.01,
                                               hash_family="xxh3"))
    st = sk.empty()
    sk.update_str(st, keys)
    assert [int(w) for w in st] == go_words
    assert sk.contains_str(st, keys).all()
    # engine serde round-trip preserves the family-tagged probe path
    sk2, st2 = BlockedBloomSketch.deserialize(sk.serialize(st),
                                              hash_family="xxh3")
    assert sk2.contains_str(st2, keys).all()
    absent = [b"@!" + bytes(alphabet[rng.integers(0, 62, int(ln))])
              for ln in rng.integers(1, 999, 400)]
    assert not sk2.contains_str(st2, absent).all()


def test_blocked_bloom_xxh3_int_keys_match_go():
    from bloom_filter_spark.sketches import BlockedBloomParams, BlockedBloomSketch
    rng = np.random.default_rng(24)
    vals = rng.choice(1 << 20, 2000, replace=False).astype(np.int32)
    byte_keys = [int(np.uint32(v)).to_bytes(4, "little") for v in vals]
    go_words = _go_blocked_bloom_words(byte_keys, n=2048, p=0.01)
    sk = BlockedBloomSketch(BlockedBloomParams(n=2048, p=0.01,
                                               hash_family="xxh3"))
    st = sk.empty()
    sk.update_i32(st, vals)
    assert [int(w) for w in st] == go_words
    assert sk.contains_i32(st, vals).all()

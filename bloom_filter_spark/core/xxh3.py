"""Vectorized XXH3-64 for inputs of ANY length — bit-parity with the
reference's hash (github.com/zeebo/xxh3 == upstream XXH3, used at
/root/reference/filter/bloom/filter.go:35-50).

Covers every fixed-width token key (int32/int64 = 4/8-byte little-endian
patterns, the north-rule workload), the 17-128 mix16B ladder, the 129-240
midsize ladder, and the >240 stripe-accumulator path (with
initCustomSecret for seeded digests) — so the reference's own demo
workload, random strings of length 0-999 (/root/reference/main.go:11,
31-36), round-trips bit-exactly.

Correctness anchors (tests/test_xxh3.py): 11 published seed-0 xxHash
sanity vectors at lengths 0/1/6/12/24/48/80/195/403/512/2048 plus 8
withSeed(prime64) vectors at 0/1/6/12/195/403/512/2048 — together pinning
every length class including the 65-128 ladder, the midsize ladder, and
the block/scramble accumulator; an independent scalar big-int twin covers
the in-between lengths; and Go-layout Bloom blobs (int32 and 0-999-byte
string workloads) round-trip byte-identically in both directions.

All arithmetic is numpy uint64 with wrapping semantics (matching C/Go).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_M64 = (1 << 64) - 1

# XXH3_kSecret — the default 192-byte secret from xxhash.h (public domain).
_SECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e")


def _r32(o: int) -> int:
    return int.from_bytes(_SECRET[o:o + 4], "little")


def _r64(o: int) -> int:
    return int.from_bytes(_SECRET[o:o + 8], "little")


_PRIME64_1 = U64(0x9E3779B185EBCA87)
_PRIME64_2 = U64(0xC2B2AE3D27D4EB4F)
_PRIME64_3 = U64(0x165667B19E3779F9)
_PRIME64_4 = U64(0x85EBCA77C2B2AE63)
_PRIME64_5 = U64(0x27D4EB2F165667C5)
_PRIME32_1 = U64(0x9E3779B1)
_PRIME32_2 = U64(0x85EBCA77)
_PRIME32_3 = U64(0xC2B2AE3D)
_PRIME_MX1 = U64(0x165667919E3779F9)   # XXH3 avalanche multiplier
_PRIME_MX2 = U64(0x9FB21C651E98DF25)   # rrmxmx multiplier

# long-path (>240 B) layout constants from the published spec
_STRIPE_LEN = 64
_SECRET_SIZE = 192
_STRIPES_PER_BLOCK = (_SECRET_SIZE - _STRIPE_LEN) // 8          # 16
_BLOCK_LEN = _STRIPE_LEN * _STRIPES_PER_BLOCK                   # 1024
_ACC_INIT = np.array([_PRIME32_3, _PRIME64_1, _PRIME64_2, _PRIME64_3,
                      _PRIME64_4, _PRIME32_2, _PRIME64_5, _PRIME32_1], U64)
_LANE_SWAP = np.array([1, 0, 3, 2, 5, 4, 7, 6])


def _xxh64_avalanche(h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = h ^ (h >> U64(33))
        h = h * _PRIME64_2
        h = h ^ (h >> U64(29))
        h = h * _PRIME64_3
        h = h ^ (h >> U64(32))
    return h


def _xxh3_avalanche(h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = h ^ (h >> U64(37))
        h = h * _PRIME_MX1
        h = h ^ (h >> U64(32))
    return h


def _rotl(x: np.ndarray, n: int) -> np.ndarray:
    return (x << U64(n)) | (x >> U64(64 - n))


def _rrmxmx(x: np.ndarray, length: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = x ^ (_rotl(x, 49) ^ _rotl(x, 24))
        x = x * _PRIME_MX2
        x = x ^ ((x >> U64(35)) + U64(length))
        x = x * _PRIME_MX2
        x = x ^ (x >> U64(28))
    return x


def _mul128(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Full 64x64->128 product as (lo, hi), via 32-bit limbs (numpy has no
    128-bit ints): a*b = (ah*bh)<<64 + (ah*bl + al*bh)<<32 + al*bl."""
    mask32 = U64(0xFFFFFFFF)
    al, ah = a & mask32, a >> U64(32)
    bl, bh = b & mask32, b >> U64(32)
    with np.errstate(over="ignore"):
        ll = al * bl                       # 64-bit exact
        lh = al * bh                       # 64-bit exact (fits: 32x32)
        hl = ah * bl
        hh = ah * bh
        # low 64: ll + ((lh + hl) << 32)  with carries into high 64
        cross = lh + (ll >> U64(32))       # no overflow: ≤ 2^64-2^33
        cross_lo = cross & mask32
        cross_hi = cross >> U64(32)
        cross2 = hl + cross_lo             # ≤ 2^64-2^33, no overflow
        lo = (ll & mask32) | ((cross2 & mask32) << U64(32))
        hi = hh + cross_hi + (cross2 >> U64(32))
    return lo, hi


def _mul128_fold64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lo, hi = _mul128(a, b)
    return lo ^ hi


def _mixed_seed(seed: int) -> int:
    """len 4-8 path: seed ^= (u64)swap32((u32)seed) << 32."""
    lo = seed & 0xFFFFFFFF
    return (seed ^ (int.from_bytes(lo.to_bytes(4, "little"), "big") << 32)) & _M64


_CUSTOM_SECRET_CACHE: dict[int, bytes] = {}


def _custom_secret(seed: int) -> bytes:
    """Long-path secret: kSecret for seed 0, else initCustomSecret — each
    16-byte lane becomes (lo64 + seed, hi64 - seed)."""
    if seed == 0:
        return _SECRET
    sec = _CUSTOM_SECRET_CACHE.get(seed)
    if sec is None:
        w = np.empty(_SECRET_SIZE // 8, dtype="<u8")
        for i in range(_SECRET_SIZE // 16):
            w[2 * i] = (_r64(16 * i) + seed) & _M64
            w[2 * i + 1] = (_r64(16 * i + 8) - seed) & _M64
        sec = w.tobytes()
        if len(_CUSTOM_SECRET_CACHE) < 64:
            _CUSTOM_SECRET_CACHE[seed] = sec
    return sec


def _s64(sec: bytes, off: int) -> int:
    return int.from_bytes(sec[off:off + 8], "little")


def _accumulate(acc: np.ndarray, stripes: np.ndarray,
                stripe_sec: np.ndarray) -> None:
    """XXH3_accumulate over a (K, S, 8) u64 stripe tensor with an (S, 8)
    secret window: per stripe s lane i,
        acc[i^1] += data[i];  acc[i] += (u32)(data[i]^sec[s,i]) * ((data[i]^sec[s,i]) >> 32)
    Addition is mod-2^64 commutative, so all S stripes between scrambles
    fold in one vectorized sum."""
    mask32 = U64(0xFFFFFFFF)
    dk = stripes ^ stripe_sec[None, :, :]
    acc += ((dk & mask32) * (dk >> U64(32))).sum(axis=1, dtype=U64)
    acc += stripes.sum(axis=1, dtype=U64)[:, _LANE_SWAP]


def _scramble(acc: np.ndarray, scramble_sec: np.ndarray) -> np.ndarray:
    acc = acc ^ (acc >> U64(47))
    acc = acc ^ scramble_sec[None, :]
    return acc * _PRIME32_1


def _hash_long_accs(mat: np.ndarray, sub: np.ndarray, ln: np.ndarray,
                    sec: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Shared >240-byte accumulator core for the 64- and 128-bit digests.

    Returns (order, accs): per-key 8-lane accumulator matrices after the
    final stripe, rows aligned with ``order`` (positions into ``sub``).
    Keys are grouped by (full blocks, partial stripes) so every group runs
    fully vectorized across keys AND stripes; the only Python-level loop is
    over the ≤ a-handful of distinct size classes and full blocks.
    """
    sec_u64 = np.frombuffer(sec, "<u8")
    # stripe s, lane j reads secret bytes [8s, 8s+64) → sliding u64 window
    stripe_sec = np.lib.stride_tricks.sliding_window_view(
        sec_u64, 8)[:_STRIPES_PER_BLOCK]
    scramble_sec = sec_u64[-8:]
    last_sec = np.array([_s64(sec, _SECRET_SIZE - _STRIPE_LEN - 7 + 8 * j)
                         for j in range(8)], U64)

    nb_blocks = (ln - 1) // _BLOCK_LEN
    ns_part = ((ln - 1) - nb_blocks * _BLOCK_LEN) // _STRIPE_LEN
    order_parts, acc_parts = [], []
    with np.errstate(over="ignore"):
        for nb, ns in sorted(set(zip(nb_blocks.tolist(), ns_part.tolist()))):
            g = np.flatnonzero((nb_blocks == nb) & (ns_part == ns))
            rows = mat[sub[g]]
            acc = np.tile(_ACC_INIT, (g.size, 1))
            for b in range(nb):
                seg = np.ascontiguousarray(
                    rows[:, b * _BLOCK_LEN:(b + 1) * _BLOCK_LEN]
                ).view("<u8").reshape(g.size, _STRIPES_PER_BLOCK, 8)
                _accumulate(acc, seg, stripe_sec)
                acc = _scramble(acc, scramble_sec)
            if ns:
                off = nb * _BLOCK_LEN
                seg = np.ascontiguousarray(
                    rows[:, off:off + ns * _STRIPE_LEN]
                ).view("<u8").reshape(g.size, ns, 8)
                _accumulate(acc, seg, stripe_sec[:ns])
            last = np.stack(
                [_gather_u64(rows, ln[g] - _STRIPE_LEN + 8 * j)
                 for j in range(8)], axis=1)
            _accumulate(acc, last[:, None, :], last_sec[None, :])
            order_parts.append(g)
            acc_parts.append(acc)
    return np.concatenate(order_parts), np.concatenate(acc_parts)


def _merge_accs(accs: np.ndarray, sec: bytes, sec_off: int,
                start: np.ndarray) -> np.ndarray:
    """XXH3_mergeAccs: start + Σ fold64(acc[2i]^sec, acc[2i+1]^sec')."""
    res = start.copy()
    with np.errstate(over="ignore"):
        for i in range(4):
            res += _mul128_fold64(
                accs[:, 2 * i] ^ U64(_s64(sec, sec_off + 16 * i)),
                accs[:, 2 * i + 1] ^ U64(_s64(sec, sec_off + 16 * i + 8)))
    return _xxh3_avalanche(res)


def xxh3_64_i32(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH3-64 of each int32's 4-byte little-endian pattern (len=4 path:
    input1 == input2 == the single 32-bit word)."""
    v = np.ascontiguousarray(values, dtype=np.int32).view(np.uint32).astype(U64)
    bitflip = U64(((_r64(8) ^ _r64(16)) - _mixed_seed(seed)) & _M64)
    with np.errstate(over="ignore"):
        x = (v + (v << U64(32))) ^ bitflip
    return _rrmxmx(x, 4)


def xxh3_64_i64(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH3-64 of each int64's 8-byte little-endian pattern (len=8 path:
    input1 = low word, input2 = high word; input64 = hi + (lo << 32))."""
    v = np.ascontiguousarray(values, dtype=np.int64).view(U64)
    lo = v & U64(0xFFFFFFFF)
    hi = v >> U64(32)
    bitflip = U64(((_r64(8) ^ _r64(16)) - _mixed_seed(seed)) & _M64)
    with np.errstate(over="ignore"):
        x = (hi + (lo << U64(32))) ^ bitflip
    return _rrmxmx(x, 8)


def _gather_u64(mat: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Little-endian u64 read at per-row byte offset from a (N, W) matrix."""
    idx = off[:, None] + np.arange(8)
    b = mat[np.arange(mat.shape[0])[:, None], idx].astype(U64)
    return (b << (U64(8) * np.arange(8, dtype=U64)[None, :])).sum(
        axis=1, dtype=U64)


def _mix16b(rows: np.ndarray, off: np.ndarray,
            soff: int, seed: int) -> np.ndarray:
    """XXH3_mix16B: fold64( (in[0:8]^(sec+seed)) * (in[8:16]^(sec-seed)) ).
    ``rows`` is the length-class submatrix, hoisted ONCE by the caller —
    fancy-indexing the full key matrix per ladder step would re-copy it
    up to ~30× per batch."""
    lo = _gather_u64(rows, off) ^ U64((_r64(soff) + seed) & _M64)
    hi = _gather_u64(rows, off + 8) ^ U64((_r64(soff + 8) - seed) & _M64)
    return _mul128_fold64(lo, hi)


def xxh3_64_bytes(values, seed: int = 0,
                  lengths: np.ndarray | None = None) -> np.ndarray:
    """XXH3-64 of variable-length byte keys (any length).

    Keys are packed into a padded uint8 matrix and processed per length
    class (0 / 1-3 / 4-8 / 9-16 / 17-128 / 129-240 / >240) with masked
    vectorized kernels; the >240 accumulator path additionally groups keys
    by (full blocks, partial stripes) so each group vectorizes across keys
    and stripes.  True lengths are taken from the Python objects (trailing
    NULs preserved).  The padded matrix costs N × max_len bytes — callers
    hashing multi-MB payloads should chunk batches by size class.

    Validation scope: every path through length 64 is pinned by the
    published sanity vectors (lengths 0/1/6/12/24/48); the 65-128 branches
    follow the published mix16B ladder (secret offsets 64/80 and 96/112)
    and are cross-checked against an independent scalar implementation,
    but no in-sandbox ground truth exists for them — cross-language parity
    claims are strongest for keys ≤ 64 bytes (every realistic id/token).

    Accepts a ``hashing.StrBuf`` (Arrow flat-buffer view) anywhere it
    accepts a list — the matrix then packs via one vectorized gather.
    """
    from .hashing import padded_key_matrix
    mat, lengths = padded_key_matrix(values, lengths, min_width=16, slack=8)
    n = lengths.shape[0]
    if n == 0:
        return np.empty(0, U64)
    out = np.empty(n, U64)

    m0 = lengths == 0
    if m0.any():
        h0 = U64((seed ^ _r64(56) ^ _r64(64)) & _M64)
        out[m0] = _xxh64_avalanche(np.full(int(m0.sum()), h0, U64))

    m13 = (lengths >= 1) & (lengths <= 3)
    if m13.any():
        sub = np.flatnonzero(m13)
        ln = lengths[sub]
        c1 = mat[sub, 0].astype(np.uint32)
        c2 = mat[sub, ln >> 1].astype(np.uint32)
        c3 = mat[sub, ln - 1].astype(np.uint32)
        combined = ((c1 << 16) | (c2 << 24) | c3
                    | (ln.astype(np.uint32) << 8)).astype(U64)
        bitflip = U64(((_r32(0) ^ _r32(4)) + seed) & _M64)
        out[sub] = _xxh64_avalanche(combined ^ bitflip)

    m48 = (lengths >= 4) & (lengths <= 8)
    if m48.any():
        sub = np.flatnonzero(m48)
        ln = lengths[sub]
        in1 = _gather_u64(mat[sub], np.zeros(len(sub), np.intp)) & U64(0xFFFFFFFF)
        in2 = _gather_u64(mat[sub], ln - 4) & U64(0xFFFFFFFF)
        bitflip = U64(((_r64(8) ^ _r64(16)) - _mixed_seed(seed)) & _M64)
        with np.errstate(over="ignore"):
            x = (in2 + (in1 << U64(32))) ^ bitflip
            x = x ^ (_rotl(x, 49) ^ _rotl(x, 24))
            x = x * _PRIME_MX2
            x = x ^ ((x >> U64(35)) + ln.astype(U64))
            x = x * _PRIME_MX2
            x = x ^ (x >> U64(28))
        out[sub] = x

    m916 = (lengths >= 9) & (lengths <= 16)
    if m916.any():
        sub = np.flatnonzero(m916)
        ln = lengths[sub]
        bf1 = U64(((_r64(24) ^ _r64(32)) + seed) & _M64)
        bf2 = U64(((_r64(40) ^ _r64(48)) - seed) & _M64)
        in_lo = _gather_u64(mat[sub], np.zeros(len(sub), np.intp)) ^ bf1
        in_hi = _gather_u64(mat[sub], ln - 8) ^ bf2
        swapped = in_lo.byteswap()
        with np.errstate(over="ignore"):
            acc = (ln.astype(U64) + swapped + in_hi
                   + _mul128_fold64(in_lo, in_hi))
        out[sub] = _xxh3_avalanche(acc)

    m17 = (lengths >= 17) & (lengths <= 128)
    if m17.any():
        sub = np.flatnonzero(m17)
        rows = mat[sub]  # hoisted once for the whole ladder
        ln = lengths[sub]
        zero = np.zeros(len(sub), np.intp)
        with np.errstate(over="ignore"):
            acc = ln.astype(U64) * _PRIME64_1
            gt32 = ln > 32
            gt64 = ln > 64
            gt96 = ln > 96
            if gt96.any():
                g = np.flatnonzero(gt96)
                acc[g] += _mix16b(rows[g], zero[g] + 48, 96, seed)
                acc[g] += _mix16b(rows[g], ln[g] - 64, 112, seed)
            if gt64.any():
                g = np.flatnonzero(gt64)
                acc[g] += _mix16b(rows[g], zero[g] + 32, 64, seed)
                acc[g] += _mix16b(rows[g], ln[g] - 48, 80, seed)
            if gt32.any():
                g = np.flatnonzero(gt32)
                acc[g] += _mix16b(rows[g], zero[g] + 16, 32, seed)
                acc[g] += _mix16b(rows[g], ln[g] - 32, 48, seed)
            acc += _mix16b(rows, zero, 0, seed)
            acc += _mix16b(rows, ln - 16, 16, seed)
        out[sub] = _xxh3_avalanche(acc)

    m129 = (lengths >= 129) & (lengths <= 240)
    if m129.any():
        sub = np.flatnonzero(m129)
        rows = mat[sub]
        ln = lengths[sub]
        with np.errstate(over="ignore"):
            acc = ln.astype(U64) * _PRIME64_1
            for i in range(8):
                acc += _mix16b(rows, np.full(len(sub), 16 * i, np.intp),
                               16 * i, seed)
            acc = _xxh3_avalanche(acc)
            nrounds = ln // 16  # 8..15
            for i in range(8, 15):
                g = np.flatnonzero(nrounds > i)
                if g.size:
                    # MIDSIZE_STARTOFFSET = 3
                    acc[g] += _mix16b(rows[g],
                                      np.full(g.size, 16 * i, np.intp),
                                      16 * (i - 8) + 3, seed)
            # last 16 bytes, secret offset SECRET_SIZE_MIN-MIDSIZE_LASTOFFSET
            acc += _mix16b(rows, ln - 16, 136 - 17, seed)
        out[sub] = _xxh3_avalanche(acc)

    m241 = lengths > 240
    if m241.any():
        sub = np.flatnonzero(m241)
        ln = lengths[sub]
        sec = _custom_secret(seed)
        order, accs = _hash_long_accs(mat, sub, ln, sec)
        with np.errstate(over="ignore"):
            start = ln[order].astype(U64) * _PRIME64_1
        # SECRET_MERGEACCS_START = 11
        out[sub[order]] = _merge_accs(accs, sec, 11, start)
    return out


def xxh3_64(data: bytes, seed: int = 0) -> int:
    """Scalar convenience wrapper (≤16 bytes)."""
    return int(xxh3_64_bytes([data], seed)[0])


def _mix32b(accl, acch, rows, off1, off2, soff: int, seed: int):
    """XXH128_mix32B over per-row offset vectors off1/off2 (``rows`` is the
    caller-hoisted length-class submatrix)."""
    with np.errstate(over="ignore"):
        accl = accl + _mix16b(rows, off1, soff, seed)
        accl = accl ^ (_gather_u64(rows, off2) + _gather_u64(rows, off2 + 8))
        acch = acch + _mix16b(rows, off2, soff + 16, seed)
        acch = acch ^ (_gather_u64(rows, off1) + _gather_u64(rows, off1 + 8))
    return accl, acch


def xxh3_128_bytes(values, seed: int = 0,
                   lengths: np.ndarray | None = None
                   ) -> tuple[np.ndarray, np.ndarray]:
    """XXH3-128 of variable-length byte keys (any length) → (lo, hi) u64
    vectors — bit-parity with the reference blocked-bloom's xxh3.Hash128
    (/root/reference/filter/blocked-bloom/filter.go:42-49: Lo selects the
    block, Hi feeds the in-block double hash).

    Same per-length-class vectorization as xxh3_64_bytes; the >240 path
    shares _hash_long_accs and differs only in the second mergeAccs for the
    high word (secret offset 117, start ~(len*PRIME64_2)).  Accepts a
    ``hashing.StrBuf`` like xxh3_64_bytes."""
    from .hashing import padded_key_matrix
    mat, lengths = padded_key_matrix(values, lengths, min_width=32, slack=8)
    n = lengths.shape[0]
    if n == 0:
        return np.empty(0, U64), np.empty(0, U64)
    out_lo = np.empty(n, U64)
    out_hi = np.empty(n, U64)

    m0 = lengths == 0
    if m0.any():
        k = int(m0.sum())
        lo0 = U64((seed ^ _r64(64) ^ _r64(72)) & _M64)
        hi0 = U64((seed ^ _r64(80) ^ _r64(88)) & _M64)
        out_lo[m0] = _xxh64_avalanche(np.full(k, lo0, U64))
        out_hi[m0] = _xxh64_avalanche(np.full(k, hi0, U64))

    m13 = (lengths >= 1) & (lengths <= 3)
    if m13.any():
        sub = np.flatnonzero(m13)
        ln = lengths[sub]
        c1 = mat[sub, 0].astype(np.uint32)
        c2 = mat[sub, ln >> 1].astype(np.uint32)
        c3 = mat[sub, ln - 1].astype(np.uint32)
        combinedl = ((c1 << 16) | (c2 << 24) | c3
                     | (ln.astype(np.uint32) << 8))
        combinedh = combinedl.byteswap()
        combinedh = (combinedh << np.uint32(13)) | (combinedh >> np.uint32(19))
        bfl = U64(((_r32(0) ^ _r32(4)) + seed) & _M64)
        bfh = U64(((_r32(8) ^ _r32(12)) - seed) & _M64)
        out_lo[sub] = _xxh64_avalanche(combinedl.astype(U64) ^ bfl)
        out_hi[sub] = _xxh64_avalanche(combinedh.astype(U64) ^ bfh)

    m48 = (lengths >= 4) & (lengths <= 8)
    if m48.any():
        sub = np.flatnonzero(m48)
        ln = lengths[sub]
        s = _mixed_seed(seed)
        in_first = _gather_u64(mat[sub], np.zeros(len(sub), np.intp)) \
            & U64(0xFFFFFFFF)
        in_last = _gather_u64(mat[sub], ln - 4) & U64(0xFFFFFFFF)
        bitflip = U64(((_r64(16) ^ _r64(24)) + s) & _M64)
        with np.errstate(over="ignore"):
            keyed = (in_first + (in_last << U64(32))) ^ bitflip
            pl = _PRIME64_1 + (ln.astype(U64) << U64(2))
            lo, hi = _mul128(keyed, pl)
            hi = hi + (lo << U64(1))
            lo = lo ^ (hi >> U64(3))
            lo = lo ^ (lo >> U64(35))
            lo = lo * _PRIME_MX2
            lo = lo ^ (lo >> U64(28))
        out_lo[sub] = lo
        out_hi[sub] = _xxh3_avalanche(hi)

    m916 = (lengths >= 9) & (lengths <= 16)
    if m916.any():
        sub = np.flatnonzero(m916)
        ln = lengths[sub]
        bfl = U64(((_r64(32) ^ _r64(40)) - seed) & _M64)
        bfh = U64(((_r64(48) ^ _r64(56)) + seed) & _M64)
        in_lo = _gather_u64(mat[sub], np.zeros(len(sub), np.intp))
        in_hi = _gather_u64(mat[sub], ln - 8)
        with np.errstate(over="ignore"):
            mlo, mhi = _mul128(in_lo ^ in_hi ^ bfl, _PRIME64_1)
            mlo = mlo + ((ln.astype(U64) - U64(1)) << U64(54))
            in_hi = in_hi ^ bfh
            mhi = mhi + in_hi + (in_hi & U64(0xFFFFFFFF)) * (_PRIME32_2 - U64(1))
            mlo = mlo ^ mhi.byteswap()
            hlo, hhi = _mul128(mlo, _PRIME64_2)
            hhi = hhi + mhi * _PRIME64_2
        out_lo[sub] = _xxh3_avalanche(hlo)
        out_hi[sub] = _xxh3_avalanche(hhi)

    def _final_midsize(accl, acch, ln):
        with np.errstate(over="ignore"):
            lo = _xxh3_avalanche(accl + acch)
            hi = (accl * _PRIME64_1 + acch * _PRIME64_4
                  + (ln.astype(U64) - U64(seed & _M64)) * _PRIME64_2)
            hi = U64(0) - _xxh3_avalanche(hi)
        return lo, hi

    m17 = (lengths >= 17) & (lengths <= 128)
    if m17.any():
        sub = np.flatnonzero(m17)
        rows = mat[sub]
        ln = lengths[sub]
        with np.errstate(over="ignore"):
            accl = ln.astype(U64) * _PRIME64_1
        acch = np.zeros(len(sub), U64)
        i_max = (ln - 1) // 32
        for i in (3, 2, 1, 0):  # descending, matching the unrolled ladder
            g = np.flatnonzero(i_max >= i)
            if not g.size:
                continue
            in1 = np.full(g.size, 16 * i, np.intp)
            in2 = ln[g] - 16 * (i + 1)
            al, ah = _mix32b(accl[g], acch[g], rows[g], in1, in2,
                             32 * i, seed)
            accl[g], acch[g] = al, ah
        out_lo[sub], out_hi[sub] = _final_midsize(accl, acch, ln)

    m129 = (lengths >= 129) & (lengths <= 240)
    if m129.any():
        sub = np.flatnonzero(m129)
        rows = mat[sub]
        ln = lengths[sub]
        with np.errstate(over="ignore"):
            accl = ln.astype(U64) * _PRIME64_1
        acch = np.zeros(len(sub), U64)
        for i in range(4):
            in1 = np.full(len(sub), 32 * i, np.intp)
            accl, acch = _mix32b(accl, acch, rows, in1, in1 + 16,
                                 32 * i, seed)
        accl = _xxh3_avalanche(accl)
        acch = _xxh3_avalanche(acch)
        nrounds = ln // 32  # 4..7
        for i in range(4, 8):
            g = np.flatnonzero(nrounds > i)
            if not g.size:
                continue
            in1 = np.full(g.size, 32 * i, np.intp)
            # MIDSIZE_STARTOFFSET = 3
            al, ah = _mix32b(accl[g], acch[g], rows[g], in1, in1 + 16,
                             3 + 32 * (i - 4), seed)
            accl[g], acch[g] = al, ah
        # last 32 bytes, swapped operands, negated seed, secret offset
        # SECRET_SIZE_MIN - MIDSIZE_LASTOFFSET - 16 = 103
        accl, acch = _mix32b(accl, acch, rows, ln - 16, ln - 32,
                             103, (-seed) & _M64)
        out_lo[sub], out_hi[sub] = _final_midsize(accl, acch, ln)

    m241 = lengths > 240
    if m241.any():
        sub = np.flatnonzero(m241)
        ln = lengths[sub]
        sec = _custom_secret(seed)
        order, accs = _hash_long_accs(mat, sub, ln, sec)
        lno = ln[order].astype(U64)
        with np.errstate(over="ignore"):
            out_lo[sub[order]] = _merge_accs(accs, sec, 11, lno * _PRIME64_1)
            out_hi[sub[order]] = _merge_accs(
                accs, sec, _SECRET_SIZE - 64 - 11,
                ~(lno * _PRIME64_2))
    return out_lo, out_hi


def xxh3_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Scalar convenience wrapper → (lo, hi)."""
    lo, hi = xxh3_128_bytes([data], seed)
    return int(lo[0]), int(hi[0])


def _len4to8_128(keyed: np.ndarray, length: int) -> tuple[np.ndarray, np.ndarray]:
    with np.errstate(over="ignore"):
        lo, hi = _mul128(keyed, _PRIME64_1 + U64(length << 2))
        hi = hi + (lo << U64(1))
        lo = lo ^ (hi >> U64(3))
        lo = lo ^ (lo >> U64(35))
        lo = lo * _PRIME_MX2
        lo = lo ^ (lo >> U64(28))
    return lo, _xxh3_avalanche(hi)


def xxh3_128_i32(values: np.ndarray, seed: int = 0
                 ) -> tuple[np.ndarray, np.ndarray]:
    """XXH3-128 of each int32's 4-byte LE pattern (len=4: first word ==
    last word == the value)."""
    v = np.ascontiguousarray(values, dtype=np.int32).view(np.uint32).astype(U64)
    s = _mixed_seed(seed)
    bitflip = U64(((_r64(16) ^ _r64(24)) + s) & _M64)
    with np.errstate(over="ignore"):
        keyed = (v + (v << U64(32))) ^ bitflip
    return _len4to8_128(keyed, 4)


def xxh3_128_i64(values: np.ndarray, seed: int = 0
                 ) -> tuple[np.ndarray, np.ndarray]:
    """XXH3-128 of each int64's 8-byte LE pattern (len=8: input64 ==
    low32 + (high32 << 32) == the value itself)."""
    v = np.ascontiguousarray(values, dtype=np.int64).view(U64)
    s = _mixed_seed(seed)
    bitflip = U64(((_r64(16) ^ _r64(24)) + s) & _M64)
    return _len4to8_128(v ^ bitflip, 8)

"""Vectorized 64-bit hashing kernels (pure numpy, no per-row Python).

Structure mirrors the reference (one 64-bit hash → lo32/hi32 split →
Kirsch–Mitzenmacher index expansion → power-of-two mask):
  - /root/reference/filter/hash.go:5-14   (DoubleHash)
  - /root/reference/filter/bloom/filter.go:34-47 (xxh3 → h1/h2 → k indices)

The engine-default mixer is splitmix64 (Steele/Lea/Vigna, public domain) —
fast, seedable, and behaviorally identical in structure (determinism,
k-index expansion, pow-2 masking).  For BIT-parity with the reference's
xxh3 (so a Go-built Bloom blob probes correctly), core/xxh3.py implements
vectorized XXH3-64 for keys ≤ 128 bytes (vector-pinned through 64),
validated against the published sanity vectors; select it with
BloomParams(hash_family="xxh3").  core/metro.py does the same for the
cuckoo filter's MetroHash64 (any key length).

Unlike the reference's Bloom filter — whose stored Seed is never actually
used in hashing (quirk Q1, /root/reference/filter/bloom/filter.go:30,39) —
hashing here is explicitly seeded; with the default seed everything is
globally deterministic, matching the reference's observable behavior.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_MASK64 = U64(0xFFFFFFFFFFFFFFFF)

# splitmix64 constants
_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_M1 = U64(0xBF58476D1CE4E5B9)
_SM_M2 = U64(0x94D049BB133111EB)

# FNV-1a 64-bit
_FNV_OFFSET = U64(0xCBF29CE484222325)
_FNV_PRIME = U64(0x100000001B3)

DEFAULT_SEED = 0x5EED_B10F_11E2_0001


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wrapping arithmetic)."""
    z = (np.asarray(x, dtype=U64) + _SM_GAMMA).astype(U64)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> U64(30))) * _SM_M1
        z = (z ^ (z >> U64(27))) * _SM_M2
        z = z ^ (z >> U64(31))
    return z


def mix_seed(seed: int) -> np.uint64:
    """Derive a well-mixed 64-bit seed word from an arbitrary int."""
    return splitmix64(np.array([seed & 0xFFFFFFFFFFFFFFFF], dtype=U64))[0]


def hash64_i32(values: np.ndarray, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Hash a vector of int32 tokens to uint64.

    A token is treated as its 4-byte two's-complement pattern (the reference
    takes opaque ``[]byte`` keys — /root/reference/filter/bloom/filter.go:38;
    an int32 key is its little-endian bytes), i.e. -1 hashes as 0xFFFFFFFF.
    """
    x = np.ascontiguousarray(values, dtype=np.int32).view(np.uint32).astype(U64)
    return splitmix64(x ^ mix_seed(seed))


def hash64_i64(values: np.ndarray, seed: int = DEFAULT_SEED) -> np.ndarray:
    x = np.ascontiguousarray(values, dtype=np.int64).view(U64)
    return splitmix64(x ^ mix_seed(seed))


def hash64_bytes(values, seed: int = DEFAULT_SEED,
                 lengths: np.ndarray | None = None) -> np.ndarray:
    """Hash variable-length byte-string keys (e.g. doc_id) to uint64.

    Vectorized FNV-1a: keys are packed into a padded (N, maxlen) uint8 matrix
    (numpy 'S' dtype) and folded column-by-column — O(maxlen) vectorized
    passes, zero per-row Python.  Length is folded into the final mix so a
    key is distinguished from itself + trailing padding.  Interior NUL bytes
    are folded correctly (length = last non-NUL position + 1, so NUL columns
    inside the key still multiply by the FNV prime).

    Trailing NULs: numpy 'S' *storage* preserves them (itemsize covers the
    raw byte length) but their position is indistinguishable from padding,
    so when the input is a Python sequence / object array of bytes the true
    per-key lengths are computed up front (one cheap pass) — keys differing
    only in trailing NULs then hash distinctly, matching the reference's
    opaque ``[]byte`` semantics.  Callers holding a pre-packed 'S' array may
    pass explicit ``lengths``; without them trailing NULs are treated as
    padding (documented limitation of that input form).
    """
    if lengths is None and not (isinstance(values, np.ndarray)
                                and values.dtype.kind == "S"):
        vlist = values if isinstance(values, (list, tuple)) else list(values)
        if vlist and isinstance(vlist[0], (bytes, bytearray)):
            lengths = np.fromiter((len(v) for v in vlist), np.intp, len(vlist))
    arr = np.asarray(values, dtype=bytes)
    n = arr.shape[0]
    if n == 0:
        return np.empty(0, dtype=U64)
    width = arr.dtype.itemsize
    mat = arr.view(np.uint8).reshape(n, width)
    if lengths is not None:
        lengths = np.asarray(lengths, np.intp)
    elif width:
        # true length = index of last non-NUL byte + 1 (0 for all-NUL rows)
        rev_nonzero = mat[:, ::-1] != 0
        lengths = np.where(rev_nonzero.any(axis=1),
                           width - rev_nonzero.argmax(axis=1), 0)
    else:
        lengths = np.zeros(n, np.intp)
    h = np.full(n, _FNV_OFFSET ^ mix_seed(seed), dtype=U64)
    with np.errstate(over="ignore"):
        for j in range(width):
            active = lengths > j
            if not active.any():
                break
            hj = h[active]
            hj = (hj ^ mat[active, j].astype(U64)) * _FNV_PRIME
            h[active] = hj
    return splitmix64(h ^ lengths.astype(U64))


def hash64_str(values, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Hash unicode strings (UTF-8 encoded) or bytes keys to uint64.

    Object inputs whose elements are ``bytes`` route through the exact-length
    bytes path (trailing NULs distinct); str inputs use the vectorized
    np.char.encode fast path (np.char strips trailing-NUL *codepoints* — a
    pathological case for text keys, use bytes keys for opaque blobs).
    """
    arr = np.asarray(values) if not isinstance(values, np.ndarray) else values
    if arr.dtype.kind == "U":
        enc = np.char.encode(arr, "utf-8")
    elif arr.dtype.kind == "S":
        enc = arr
    elif arr.dtype.kind == "O" and arr.size and isinstance(arr.flat[0], (bytes, bytearray)):
        return hash64_bytes(arr, seed)
    else:  # object array of python strs (pandas)
        enc = np.char.encode(arr.astype("U"), "utf-8")
    return hash64_bytes(enc, seed)


def split_h1_h2(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split a 64-bit hash into (lo32, hi32) — reference filter/hash.go:7-8."""
    h1 = h & U64(0xFFFFFFFF)
    h2 = h >> U64(32)
    return h1, h2


def km_indices(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """Kirsch–Mitzenmacher double hashing: (N,) uint64 hash → (N, k) indices.

    index_i = (h1 + i*h2) & (m-1), m a power of two — exactly the reference's
    expansion (/root/reference/filter/hash.go:9-13, bloom/filter.go:40-46),
    as one broadcast matrix op per Arrow batch.
    """
    h1, h2 = split_h1_h2(h)
    i = np.arange(k, dtype=U64)
    with np.errstate(over="ignore"):
        idx = (h1[:, None] + i[None, :] * h2[:, None]) & U64(m - 1)
    return idx


def clz64(w: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (exact, no float tricks)."""
    w = np.asarray(w, dtype=U64)
    n = np.zeros(w.shape, dtype=np.uint8)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (U64(1) << U64(s))
        n[big] += np.uint8(s)
        v[big] >>= U64(s)
    out = np.where(w == 0, np.uint8(64), np.uint8(63) - n)
    return out.astype(np.uint8)


def next_power_of_two(n: int) -> int:
    """Identical semantics to the reference (/root/reference/filter/utils.go:23-31):
    0 → 0, exact powers map to themselves, else round up."""
    if n <= 0:
        return 0
    return 1 << (int(n) - 1).bit_length()


# measured on this box (numpy 1.26, 9M updates into 2^20 bits):
#   bool-fancy-assign + packbits  0.045 s
#   np.bitwise_or.at              0.081 s
#   argsort + reduceat            3.6 s
# numpy ≥1.25 vectorizes ufunc.at, so the .at forms are the right primitive;
# the packbits path wins when the whole bit array fits comfortably in memory
# as one byte per bit (m ≤ 2^27 = 16 MiB of bool).
_PACKBITS_MAX_BITS = 1 << 27


def set_bits(bits: np.ndarray, idx: np.ndarray, m: int) -> None:
    """Set bit positions ``idx`` (duplicates fine) in an LSB-first u64-word
    bit array of m bits (reference layout: Bits[i>>6] |= 1<<(i&63),
    /root/reference/filter/bloom/filter.go:43-46)."""
    if idx.size == 0:
        return
    if 64 <= m <= _PACKBITS_MAX_BITS:  # need whole u64 words to view-cast
        bb = np.zeros(m, dtype=bool)
        bb[idx.astype(np.int64)] = True
        packed = np.packbits(bb, bitorder="little").view(np.uint64)
        bits[: m >> 6] |= packed
    else:
        words = (idx >> U64(6)).astype(np.int64)
        vals = U64(1) << (idx & U64(63))
        np.bitwise_or.at(bits, words, vals)


def max_reduce_at(regs: np.ndarray, idx: np.ndarray, vals: np.ndarray) -> None:
    """regs[idx] = max(regs[idx], vals) with duplicate-index correctness."""
    np.maximum.at(regs, idx, vals)

"""Vectorized MetroHash64 — bit-parity with the reference cuckoo filter's
hash (github.com/dgryski/go-metro == J. Andrew Rogers' metrohash64, used at
/root/reference/filter/cuckoo/filter.go:110,121).

Validated against the published metrohash test vector (the 63-byte ASCII
string "0123...012"): seed 0 → 0xAD4B7006AE3D756B and seed 1 →
0xDFB8B9F41C480D3B as returned uint64s (the upstream README prints the same
values in byte order: 6B753DAE06704BAD / 3B0D481CF4B9B8DF) — see
tests/test_metro.py, which also cross-checks an independent scalar
implementation on random keys of every length 0-100.

Arbitrary key lengths are supported: the 32-byte block loop runs
max-blocks times with per-row active masks, tails are per-length-class
masked gathers.  All arithmetic is numpy uint64 with wrapping semantics.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_K0 = U64(0xD6D018F5)
_K1 = U64(0xA2AA033B)
_K2 = U64(0x62992FC1)
_K3 = U64(0x30BC5B29)


def _rotr(x: np.ndarray, n: int) -> np.ndarray:
    return (x >> U64(n)) | (x << U64(64 - n))


def _gather(mat: np.ndarray, rows: np.ndarray, off: np.ndarray,
            nbytes: int) -> np.ndarray:
    """Little-endian unsigned read of nbytes at per-row byte offsets."""
    idx = off[:, None] + np.arange(nbytes)
    b = mat[rows[:, None], idx].astype(U64)
    return (b << (U64(8) * np.arange(nbytes, dtype=U64)[None, :])).sum(
        axis=1, dtype=U64)


def metro64_bytes(values, seed: int = 0,
                  lengths: np.ndarray | None = None) -> np.ndarray:
    """MetroHash64 of variable-length byte keys (any length), vectorized.
    Accepts a ``hashing.StrBuf`` (Arrow flat-buffer view) like the xxh3
    kernels — the matrix then packs via one vectorized gather."""
    from .hashing import padded_key_matrix
    mat, lengths = padded_key_matrix(values, lengths, min_width=0, slack=8)
    n = lengths.shape[0]
    if n == 0:
        return np.empty(0, U64)

    rows_all = np.arange(n)
    h0 = ((int(seed) + 0x62992FC1) * 0xD6D018F5) & 0xFFFFFFFFFFFFFFFF
    h = np.full(n, h0, U64)
    pos = np.zeros(n, np.intp)

    with np.errstate(over="ignore"):
        # ---- 32-byte block loop (rows with len >= 32) --------------------
        n_blocks = np.maximum(lengths, 0) // 32
        has_blocks = n_blocks > 0
        if has_blocks.any():
            sub = np.flatnonzero(has_blocks)
            v0 = h[sub].copy()
            v1 = v0.copy()
            v2 = v0.copy()
            v3 = v0.copy()
            sub_pos = np.zeros(len(sub), np.intp)
            remaining = n_blocks[sub].copy()
            while (remaining > 0).any():
                act = np.flatnonzero(remaining > 0)
                r = sub[act]
                p = sub_pos[act]
                v0[act] = _rotr(v0[act] + _gather(mat, r, p, 8) * _K0, 29) + v2[act]
                v1[act] = _rotr(v1[act] + _gather(mat, r, p + 8, 8) * _K1, 29) + v3[act]
                v2[act] = _rotr(v2[act] + _gather(mat, r, p + 16, 8) * _K2, 29) + v0[act]
                v3[act] = _rotr(v3[act] + _gather(mat, r, p + 24, 8) * _K3, 29) + v1[act]
                sub_pos[act] += 32
                remaining[act] -= 1
            v2 ^= _rotr((v0 + v3) * _K0 + v1, 37) * _K1
            v3 ^= _rotr((v1 + v2) * _K1 + v0, 37) * _K0
            v0 ^= _rotr((v0 + v2) * _K0 + v3, 37) * _K1
            v1 ^= _rotr((v1 + v3) * _K1 + v2, 37) * _K0
            h[sub] += v0 ^ v1
            pos[sub] = sub_pos

        rem = lengths - pos

        # ---- 16-byte tail -------------------------------------------------
        m16 = rem >= 16
        if m16.any():
            r = rows_all[m16]
            p = pos[m16]
            w0 = _rotr(h[m16] + _gather(mat, r, p, 8) * _K2, 29) * _K3
            w1 = _rotr(h[m16] + _gather(mat, r, p + 8, 8) * _K2, 29) * _K3
            w0 ^= _rotr(w0 * _K0, 21) + w1
            w1 ^= _rotr(w1 * _K3, 21) + w0
            h[m16] += w1
            pos[m16] += 16
            rem = lengths - pos

        for nbytes, rot in ((8, 55), (4, 26), (2, 48), (1, 37)):
            mk = rem >= nbytes
            if mk.any():
                r = rows_all[mk]
                hk = h[mk] + _gather(mat, r, pos[mk], nbytes) * _K3
                h[mk] = hk ^ (_rotr(hk, rot) * _K1)
                pos[mk] += nbytes
                rem = lengths - pos

        h ^= _rotr(h, 28)
        h *= _K0
        h ^= _rotr(h, 29)
    return h


def metro64_i32(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """MetroHash64 of each int32's 4-byte LE pattern (len-4 fast path)."""
    v = np.ascontiguousarray(values, dtype=np.int32).view(np.uint32).astype(U64)
    h0 = ((int(seed) + 0x62992FC1) * 0xD6D018F5) & 0xFFFFFFFFFFFFFFFF
    with np.errstate(over="ignore"):
        h = np.full(v.shape, h0, U64)
        h = h + v * _K3
        h = h ^ (_rotr(h, 26) * _K1)
        h ^= _rotr(h, 28)
        h *= _K0
        h ^= _rotr(h, 29)
    return h


def metro64_i64(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """MetroHash64 of each int64's 8-byte LE pattern (len-8 fast path)."""
    v = np.ascontiguousarray(values, dtype=np.int64).view(U64)
    h0 = ((int(seed) + 0x62992FC1) * 0xD6D018F5) & 0xFFFFFFFFFFFFFFFF
    with np.errstate(over="ignore"):
        h = np.full(v.shape, h0, U64)
        h = h + v * _K3
        h = h ^ (_rotr(h, 55) * _K1)
        h ^= _rotr(h, 28)
        h *= _K0
        h ^= _rotr(h, 29)
    return h


def metro64(data: bytes, seed: int = 0) -> int:
    """Scalar convenience wrapper."""
    return int(metro64_bytes([data], seed)[0])

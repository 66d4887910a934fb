"""Counting Bloom filter — deletable approximate membership, union-mergeable.

Fan, Cao, Almeida & Broder 2000 ("Summary Cache"): replace each bit of the
classic filter with a counter; insert increments the k counters, delete
decrements them, membership = all k counters ≥ 1.  Same sizing math, index
expansion and FPR analysis as the reference's Bloom filter
(/root/reference/filter/bloom/filter.go:23-25, hash.go:5-14) — this sketch
reuses ``BloomParams`` verbatim, so k/m/FPR behavior is identical to the
reference's insert-only filter; only the per-cell state widens.

Why it exists next to the cuckoo filter (which also deletes,
/root/reference/filter/cuckoo/filter.go:87-106): cuckoo states are NOT
union-mergeable (bucket overflow), so distributed cuckoo is scoped to
single-writer grouped builds.  Counting-bloom states merge by element-wise
counter SUM — associative and commutative — which makes *distributed
deletes* expressible: partitions fold inserts as +1 and deletes as −1
(``update_delta_*``, no per-partition presence check), the merge sums the
deltas, and the merged filter answers membership for the global multiset.
The required discipline is the classic one: globally, a key must never be
deleted more times than it was inserted (counters would go negative and the
guarantee degrades exactly like an underflowed 4-bit counting bloom).

Checked semantics (``delete_*``): batch-checks presence first and only
decrements keys whose k counters are all ≥ 1, returning the per-key "was
present" mask — the cuckoo delete contract (multiset: removes ONE copy).

Invariants (insert-only or disciplined delete): zero false negatives for
live keys; FPR ≤ the classic filter's at equal (m, k); ``point()`` =
min over the k counters never underestimates a key's live multiplicity
(the CMS argument restricted to k cells).
"""

from __future__ import annotations

import numpy as np

from ..core import hashing
from ..core.serde import Reader, pack_u32, pack_u64
from .base import register
from .bloom import BloomParams

# Counters are int32: a cell's expected load is n·k/m < 1 (the filter is
# sized for ~0.5 bits set per cell), so int32 overflow would need ~2^31
# same-cell inserts — unreachable before the filter is useless anyway.
_DTYPE = np.int32


@register
class CountingBloomSketch:
    kind = "cbloom"

    def __init__(self, params: BloomParams):
        # _hash below is splitmix64-only; silently accepting an xxh3-family
        # BloomParams would hand back a non-parity filter (ADVICE r3)
        if params.hash_family != "splitmix64":
            raise ValueError(
                "CountingBloomSketch hashes with splitmix64 only; got "
                f"hash_family={params.hash_family!r}")
        self.params = params

    # -- state ------------------------------------------------------------
    def empty(self) -> np.ndarray:
        return np.zeros(self.params.m, dtype=_DTYPE)

    # -- hashing (same K-M expansion as BloomSketch) -----------------------
    def _hash(self, values, kind: str) -> np.ndarray:
        p = self.params
        fn = {"i32": hashing.hash64_i32, "i64": hashing.hash64_i64,
              "str": hashing.hash64_str}[kind]
        if kind == "i32":
            return fn(np.asarray(values, np.int32), p.seed)
        if kind == "i64":
            return fn(np.asarray(values, np.int64), p.seed)
        return fn(values, p.seed)

    def _indices(self, h: np.ndarray) -> np.ndarray:
        """(k, N) int64 cell indices via the K-M expansion
        (idx_i = (h1 + i·h2) & (m-1) — hash.go:5-14)."""
        p = self.params
        mask = np.uint64(p.m - 1)
        h1, h2 = hashing.split_h1_h2(h)
        out = np.empty((p.k, h.size), np.int64)
        idx = np.empty(h.size, np.uint64)
        with np.errstate(over="ignore"):
            for i in range(p.k):
                np.multiply(h2, np.uint64(i), out=idx)
                np.add(idx, h1, out=idx)
                np.bitwise_and(idx, mask, out=idx)
                out[i] = idx.astype(np.int64)
        return out

    # -- build ------------------------------------------------------------
    def _apply_delta(self, state, h: np.ndarray, delta) -> None:
        idx = self._indices(h)
        d = np.asarray(delta, _DTYPE)
        for i in range(idx.shape[0]):
            np.add.at(state, idx[i], d)

    def update_i32(self, state, values) -> None:
        self._apply_delta(state, self._hash(values, "i32"), 1)

    def update_i64(self, state, values) -> None:
        self._apply_delta(state, self._hash(values, "i64"), 1)

    def update_str(self, state, values) -> None:
        self._apply_delta(state, self._hash(values, "str"), 1)

    # -- distributed delete fold (no presence check — see module doc) ------
    def update_delta_i32(self, state, values, signs) -> None:
        self._apply_delta(state, self._hash(values, "i32"), signs)

    def update_delta_str(self, state, values, signs) -> None:
        self._apply_delta(state, self._hash(values, "str"), signs)

    # -- probe ------------------------------------------------------------
    def _min_counter(self, state, h: np.ndarray) -> np.ndarray:
        idx = self._indices(h)
        acc = state[idx[0]]
        for i in range(1, idx.shape[0]):
            np.minimum(acc, state[idx[i]], out=acc)
        return acc

    def contains_i32(self, state, values) -> np.ndarray:
        return self._min_counter(state, self._hash(values, "i32")) >= 1

    def contains_i64(self, state, values) -> np.ndarray:
        return self._min_counter(state, self._hash(values, "i64")) >= 1

    def contains_str(self, state, values) -> np.ndarray:
        return self._min_counter(state, self._hash(values, "str")) >= 1

    # -- frequency upper bound (CMS argument on k cells) -------------------
    def point_str(self, state, values) -> np.ndarray:
        return np.maximum(self._min_counter(state, self._hash(values, "str")), 0)

    def point_i32(self, state, values) -> np.ndarray:
        return np.maximum(self._min_counter(state, self._hash(values, "i32")), 0)

    # -- checked delete (cuckoo contract: remove ONE copy if present) ------
    # NB the presence check guards against deleting keys whose counters are
    # already exhausted; it can NOT protect against deleting a key that was
    # never inserted but false-positives (its decrements then corrupt other
    # keys' cells — the classic counting-filter caveat, identical for
    # sequential deletes and for the cuckoo filter's fingerprint deletes).
    # The delete-≤-insert-per-key discipline remains the caller's contract.
    def _delete_hashes(self, state, h: np.ndarray) -> np.ndarray:
        present = self._min_counter(state, h) >= 1
        # Within-batch duplicate deletes of a key present once both pass the
        # batch-start check; the second decrement would underflow.  Decrement
        # sequentially per distinct key copy instead: cap each distinct
        # key's decrements at its batch-start min counter.
        if present.any():
            hp = h[present]
            uh, inv, cnt = np.unique(hp, return_inverse=True, return_counts=True)
            start = self._min_counter(state, uh)
            allowed = np.minimum(cnt.astype(np.int64), start.astype(np.int64))
            # first `allowed[j]` occurrences of key j decrement; later
            # duplicates report not-present (multiset exhausted mid-batch)
            order = np.argsort(inv, kind="stable")
            occ = np.empty(hp.size, np.int64)
            ranks = np.arange(hp.size) - np.repeat(
                np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
            occ[order] = ranks
            do_del = occ < allowed[inv]
            dele = np.flatnonzero(present)[do_del]
            self._apply_delta(state, h[dele], -1)
            full = np.zeros(h.size, bool)
            full[dele] = True
            return full
        return present

    def delete_str(self, state, values) -> np.ndarray:
        return self._delete_hashes(state, self._hash(values, "str"))

    def delete_i32(self, state, values) -> np.ndarray:
        return self._delete_hashes(state, self._hash(values, "i32"))

    # -- merge ------------------------------------------------------------
    def merge(self, a, b) -> np.ndarray:
        return a + b

    # -- sharded serde (scale path for WIDE counter arrays) ----------------
    # A full-capacity counting bloom at 10^7+ keys serializes to hundreds of
    # MB; shipping that as ONE blob per partition forces the merge to either
    # coalesce the scan (losing parallelism) or funnel GB-scale rows through
    # a serial fanin tree.  Sharding splits the counter array into
    # column-range segments emitted as (shard_id, bytes) rows, so the merge
    # becomes a single groupBy(shard_id) — state WIDTH converts to merge
    # PARALLELISM, and per-merge-task memory is one shard, not the filter.
    # Segments with few touched cells ship sparse ((u32 rel-idx, i4 val)
    # pairs): a partition's shard volume is bounded by its row count × k,
    # not by m — at scale the shuffle carries the data actually written.
    # Layout (LE): u32 m | u32 k | u64 seed | u32 n_shards | u32 shard_id |
    #              u8 mode | mode 0: dense <i4 cells[lo:hi]
    #                       | mode 1: u32 nnz | <u4 rel_idx×nnz | <i4 val×nnz
    def shard_count(self, target_bytes: int = 8 << 20) -> int:
        """Number of column-range shards so a dense shard ≈ target_bytes."""
        return max(1, -(-self.params.m * 4 // target_bytes))

    def shard_bounds(self, shard_id: int, n_shards: int) -> tuple[int, int]:
        m = self.params.m
        return shard_id * m // n_shards, (shard_id + 1) * m // n_shards

    def _emit_segment(self, seg: np.ndarray, shard_id: int,
                      n_shards: int) -> bytes:
        p = self.params
        header = (pack_u32(p.m) + pack_u32(p.k) + pack_u64(p.seed)
                  + pack_u32(n_shards) + pack_u32(shard_id))
        nz = np.flatnonzero(seg)
        if nz.size * 8 < seg.size * 4:  # sparse wins below 50% fill
            return (header + b"\x01" + pack_u32(nz.size)
                    + nz.astype("<u4").tobytes()
                    + seg[nz].astype("<i4").tobytes())
        return header + b"\x00" + seg.astype("<i4").tobytes()

    def serialize_shard(self, state: np.ndarray, shard_id: int,
                        n_shards: int) -> bytes:
        lo, hi = self.shard_bounds(shard_id, n_shards)
        return self._emit_segment(state[lo:hi], shard_id, n_shards)

    # -- sparse accumulation (per-task memory ∝ data, not filter width) ----
    def delta_cells(self, values, signs, kind: str
                    ) -> tuple[np.ndarray, np.ndarray]:
        """Hashed (cell index, ±delta) pairs for a batch — k entries per
        key, NO dense array.  np.add.at of these pairs reproduces
        _apply_delta exactly (addition commutes over duplicates)."""
        h = self._hash(values, kind)
        idx = self._indices(h)  # (k, N)
        d = np.asarray(signs, _DTYPE)
        if d.ndim == 0:
            d = np.full(h.size, d, _DTYPE)
        return idx.ravel(), np.tile(d, self.params.k)

    def serialize_shard_from_cells(self, idx: np.ndarray, delta: np.ndarray,
                                   shard_id: int, n_shards: int) -> bytes:
        """Shard blob straight from sparse (cell, delta) pairs: transient
        memory = one shard segment + the pairs, never the full counter
        array.  ``idx`` may contain cells outside the shard (they are
        masked) and duplicate cells (they sum)."""
        lo, hi = self.shard_bounds(shard_id, n_shards)
        seg = np.zeros(hi - lo, dtype=_DTYPE)
        m_ = (idx >= lo) & (idx < hi)
        if m_.any():
            np.add.at(seg, idx[m_] - lo, delta[m_])
        return self._emit_segment(seg, shard_id, n_shards)

    _SHARD_HEADER_LEN = 24

    @classmethod
    def merge_shard_blobs(cls, blobs: list) -> bytes:
        """Counter-sum N same-shard blobs → one DENSE shard blob.  All blobs
        must agree on (m, k, seed, n_shards, shard_id) — header-checked like
        merge_blobs."""
        head = bytes(blobs[0][:cls._SHARD_HEADER_LEN])
        r = Reader(head)
        m, k = r.u32(), r.u32()
        r.u64()
        n_shards, shard_id = r.u32(), r.u32()
        lo = shard_id * m // n_shards
        hi = (shard_id + 1) * m // n_shards
        acc = np.zeros(hi - lo, dtype=_DTYPE)
        for b in blobs:
            b = bytes(b)
            if b[:cls._SHARD_HEADER_LEN] != head:
                raise ValueError(
                    "refusing to merge cbloom shards with different "
                    "params/seeds/shard identity")
            r = Reader(b)
            r.pos = cls._SHARD_HEADER_LEN
            mode = b[r.pos]
            r.pos += 1
            if mode == 1:
                nnz = r.u32()
                idx = r.array("<u4", nnz)
                val = r.array("<i4", nnz)
                np.add.at(acc, idx.astype(np.int64), val.astype(_DTYPE))
            else:
                acc += r.array("<i4", hi - lo).astype(_DTYPE)
        return (head + b"\x00" + acc.astype("<i4").tobytes())

    @classmethod
    def reassemble_shards(cls, blobs: list) -> bytes:
        """DENSE shard blobs (one per shard_id, any order) → the monolithic
        serialize() layout, bit-for-bit."""
        parsed = {}
        m = k = seed = n_shards = None
        for b in blobs:
            b = bytes(b)
            r = Reader(b)
            bm, bk, bseed, bn, sid = r.u32(), r.u32(), r.u64(), r.u32(), r.u32()
            if m is None:
                m, k, seed, n_shards = bm, bk, bseed, bn
            elif (bm, bk, bseed, bn) != (m, k, seed, n_shards):
                raise ValueError("mixed-filter shards in reassembly")
            if b[r.pos] != 0:
                raise ValueError("reassembly expects dense shard blobs")
            parsed[sid] = b[r.pos + 1:]
        if sorted(parsed) != list(range(n_shards)):
            raise ValueError(
                f"incomplete shard set: have {sorted(parsed)} of {n_shards}")
        body = b"".join(parsed[i] for i in range(n_shards))
        return pack_u32(m) + pack_u32(k) + pack_u64(seed) + body

    # -- serde (engine layout; the reference has no counting filter) -------
    def serialize(self, state: np.ndarray) -> bytes:
        p = self.params
        header = pack_u32(p.m) + pack_u32(p.k) + pack_u64(p.seed)
        return header + state.astype("<i4").tobytes()

    @classmethod
    def deserialize(cls, blob: bytes, n: int | None = None,
                    p: float | None = None):
        r = Reader(blob)
        m = r.u32()
        k = r.u32()
        seed = r.u64()
        state = r.array("<i4", m).astype(_DTYPE)
        params = object.__new__(BloomParams)
        object.__setattr__(params, "n", n or 0)
        object.__setattr__(params, "p", p or 0.0)
        object.__setattr__(params, "seed", seed)
        object.__setattr__(params, "hash_family", "splitmix64")
        object.__setattr__(params, "m_pre", m)
        object.__setattr__(params, "k", k)
        object.__setattr__(params, "m", m)
        object.__setattr__(params, "n_words", (m >> 6) + 1)
        return cls(params), state

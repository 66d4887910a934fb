"""Reference-compatible single-process facade.

A user of the Go library (github.com/rag-nar1/Bloom-Filter) can switch to
this module with a mechanical rename — same constructors, same operations,
same serialized byte layouts:

    Go (reference)                          here
    --------------------------------------  ------------------------------
    bloom.NewBloomFilter(n, fpRate)         BloomFilter(n, fp_rate)
    f.Insert(data []byte)                   f.insert(data)        # bytes/str/int
    f.Exist(data []byte) bool               f.exist(data)
    f.Serialize() []byte                    f.serialize()
    bloom.Deserialize(data)                 BloomFilter.deserialize(data)
    blockedbloom.NewBlockedBloomFilter(...) BlockedBloomFilter(n, fp_rate)
    cuckoo.NewCuckooFilter(n, loadFactor)   CuckooFilter(n, load_factor)
    f.Insert / f.Lookup / f.Delete          f.insert / f.lookup / f.delete

(reference cites: bloom/filter.go:20-92, blocked-bloom/filter.go:25-68,
cuckoo/filter.go:28-179.)  Batch variants (``insert_many`` etc.) expose the
vectorized kernels; the distributed lifecycle lives in operators/.
"""

from __future__ import annotations

import numpy as np

from .sketches import (
    BlockedBloomParams, BlockedBloomSketch, BloomParams, BloomSketch,
    CuckooFilter as _CuckooKernel, CuckooParams,
)


def _as_batch(data) -> tuple[np.ndarray | list, str]:
    """Normalize a single key to a one-element batch + kind.

    bytes keys stay raw bytes (the reference takes opaque []byte — arbitrary
    non-UTF8 payloads must hash, not decode); ints always take the 64-bit
    hash path so values ≥ 2^31 neither truncate nor alias their low words.
    """
    if isinstance(data, bytes):
        # object dtype so hash64_bytes sees the true length — keys differing
        # only in trailing NULs must hash distinctly ([]byte semantics)
        return np.array([data], dtype=object), "str"
    if isinstance(data, str):
        return np.array([data]), "str"
    if isinstance(data, (int, np.integer)):
        return np.array([data], np.int64), "i64"
    raise TypeError(f"unsupported key type {type(data)}")


class _MembershipFilter:
    _sketch_cls = None
    _params_cls = None

    def __init__(self, n: int, fp_rate: float, **kw):
        self._sketch = self._sketch_cls(self._params_cls(n=n, p=fp_rate, **kw))
        self._state = self._sketch.empty()

    def insert(self, data) -> None:
        batch, kind = _as_batch(data)
        getattr(self._sketch, f"update_{kind}")(self._state, batch)

    def exist(self, data) -> bool:
        batch, kind = _as_batch(data)
        return bool(getattr(self._sketch, f"contains_{kind}")(self._state, batch)[0])

    # batch forms (vectorized hot path); ints always hash via the 64-bit
    # path so mixed-magnitude batches stay consistent with single inserts
    def insert_many(self, values) -> None:
        arr = np.asarray(values)
        if arr.dtype.kind in "iu":
            self._sketch.update_i64(self._state, arr.astype(np.int64))
        else:
            self._sketch.update_str(self._state, list(values))

    def exist_many(self, values) -> np.ndarray:
        arr = np.asarray(values)
        if arr.dtype.kind in "iu":
            return self._sketch.contains_i64(self._state, arr.astype(np.int64))
        return self._sketch.contains_str(self._state, list(values))

    def serialize(self) -> bytes:
        return self._sketch.serialize(self._state)

    @classmethod
    def deserialize(cls, data: bytes, **kw):
        """kw passes through to the sketch deserializer — e.g.
        hash_family="xxh3" for a blob produced by the Go reference."""
        obj = object.__new__(cls)
        obj._sketch, obj._state = cls._sketch_cls.deserialize(data, **kw)
        return obj

    def merge(self, other) -> None:
        """Union (engine extension — the reference has no merge; validity per
        SURVEY.md §2.1: equal params ⇒ union = bitwise OR)."""
        self._state = self._sketch.merge(self._state, other._state)


class BloomFilter(_MembershipFilter):
    _sketch_cls = BloomSketch
    _params_cls = BloomParams

    @property
    def m(self) -> int:
        return self._sketch.params.m

    @property
    def k(self) -> int:
        return self._sketch.params.k


class BlockedBloomFilter(_MembershipFilter):
    _sketch_cls = BlockedBloomSketch
    _params_cls = BlockedBloomParams


class CuckooFilter:
    def __init__(self, n: int, load_factor: float, **kw):
        self._kernel = _CuckooKernel(CuckooParams(n=n, load_factor=load_factor, **kw))
        self._state = self._kernel.empty()
        self._rng_counter = 0

    def insert(self, data) -> bool:
        """Returns False on capacity failure (cuckoo/filter.go:39-49)."""
        batch, kind = _as_batch(data)
        self._rng_counter += 1
        failed = getattr(self._kernel, f"insert_{kind}")(
            self._state, batch, rng_seed=self._rng_counter)
        return failed == 0

    def lookup(self, data) -> bool:
        batch, kind = _as_batch(data)
        return bool(getattr(self._kernel, f"contains_{kind}")(self._state, batch)[0])

    def delete(self, data) -> bool:
        batch, kind = _as_batch(data)
        return bool(getattr(self._kernel, f"delete_{kind}")(self._state, batch)[0])

    def serialize(self) -> bytes:
        return self._kernel.serialize(self._state)

    @classmethod
    def deserialize(cls, data: bytes, **kw):
        """kw passes through — e.g. hash_family="metro" for a blob produced
        by the Go reference."""
        obj = object.__new__(cls)
        obj._kernel, obj._state = _CuckooKernel.deserialize(data, **kw)
        obj._rng_counter = 0
        return obj

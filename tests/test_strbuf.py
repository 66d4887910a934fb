"""Zero-copy Arrow string path (core/hashing.py::StrBuf) — VERDICT r4 #3.

Pins that hashing UTF-8 keys straight from the Arrow offsets/values buffers
is bit-identical to the object-list path for every str-keyed sketch and
hash family, and that the Spark build/probe hot paths no longer materialize
Python strings (state parity list-build vs DataFrame-build).
"""

import numpy as np
import pyarrow as pa
import pytest

from bloom_filter_spark.core import hashing as H
from bloom_filter_spark.core import metro, xxh3
from bloom_filter_spark.sketches.blocked_bloom import (BlockedBloomParams,
                                                        BlockedBloomSketch)
from bloom_filter_spark.sketches.bloom import BloomParams, BloomSketch
from bloom_filter_spark.sketches.cms import CMSParams, CMSSketch
from bloom_filter_spark.sketches.counting_bloom import CountingBloomSketch
from bloom_filter_spark.sketches.cuckoo import CuckooFilter, CuckooParams
from bloom_filter_spark.sketches.hll import HLLParams, HLLSketch
from bloom_filter_spark.sketches.kmv import KMVParams, KMVSketch

KEYS = (["doc_%06d" % i for i in range(500)]
        + ["", "a", "héllo wörld", "x" * 300, "\x00lead", "mid\x00dle"]
        + ["변환테스트", "längère-clé-" * 20])


def _buf(keys=KEYS):
    return H.arrow_strbuf(pa.array(keys, pa.string()))


def test_flat_fnv_matches_bytes_matrix():
    b = _buf()
    enc = [k.encode() for k in KEYS]
    assert np.array_equal(H.hash64_bytes(enc), H.hash64_str(b))
    assert np.array_equal(H.hash64_bytes(enc, seed=7),
                          H.hash64_flat_bytes(b.flat, b.starts, b.lengths, 7))


def test_strbuf_slice_and_large_types():
    arr = pa.array(KEYS + [None, "tail"], pa.string())
    b = H.arrow_strbuf(arr)  # null dropped
    assert np.array_equal(H.hash64_str(b),
                          H.hash64_bytes([k.encode() for k in KEYS + ["tail"]]))
    sl = H.arrow_strbuf(arr.slice(3, 10))
    assert np.array_equal(H.hash64_str(sl),
                          H.hash64_bytes([k.encode() for k in KEYS[3:13]]))
    for t in (pa.large_string(), pa.binary(), pa.large_binary()):
        vals = [k.encode() for k in KEYS] if "binary" in str(t) else KEYS
        assert np.array_equal(H.hash64_str(H.arrow_strbuf(pa.array(vals, t))),
                              H.hash64_bytes([k.encode() for k in KEYS]))


def test_parity_kernels_accept_strbuf():
    enc = [k.encode() for k in KEYS]
    b = _buf()
    assert np.array_equal(xxh3.xxh3_64_bytes(enc), xxh3.xxh3_64_bytes(b))
    lo1, hi1 = xxh3.xxh3_128_bytes(enc)
    lo2, hi2 = xxh3.xxh3_128_bytes(b)
    assert np.array_equal(lo1, lo2) and np.array_equal(hi1, hi2)
    assert np.array_equal(metro.metro64_bytes(enc, 3),
                          metro.metro64_bytes(b, 3))


@pytest.mark.parametrize("family", ["splitmix64", "xxh3"])
def test_bloom_strbuf_state_and_probe_parity(family):
    sk = BloomSketch(BloomParams(n=2000, p=0.01, hash_family=family))
    s1, s2 = sk.empty(), sk.empty()
    sk.update_str(s1, KEYS)
    sk.update_str(s2, _buf())
    assert sk.serialize(s1) == sk.serialize(s2)
    assert np.array_equal(sk.contains_str(s1, KEYS),
                          sk.contains_str(s1, _buf()))


def test_blocked_bloom_cuckoo_cbloom_strbuf_parity():
    for fam in ("splitmix64", "xxh3"):
        bb = BlockedBloomSketch(BlockedBloomParams(n=2000, p=0.01, hash_family=fam))
        s1, s2 = bb.empty(), bb.empty()
        bb.update_str(s1, KEYS)
        bb.update_str(s2, _buf())
        assert bb.serialize(s1) == bb.serialize(s2)
    for fam in ("splitmix64", "metro"):
        ck = CuckooFilter(CuckooParams(n=4000, load_factor=0.95, hash_family=fam))
        s1, s2 = ck.empty(), ck.empty()
        ck.insert_str(s1, KEYS) if hasattr(ck, "insert_str") else ck.update_str(s1, KEYS)
        ck.insert_str(s2, _buf()) if hasattr(ck, "insert_str") else ck.update_str(s2, _buf())
        assert ck.serialize(s1) == ck.serialize(s2)
        assert np.array_equal(ck.contains_str(s1, KEYS),
                              ck.contains_str(s1, _buf()))
    cb = CountingBloomSketch(BloomParams(n=2000, p=0.01))
    s1, s2 = cb.empty(), cb.empty()
    cb.update_str(s1, KEYS)
    cb.update_str(s2, _buf())
    signs = np.where(np.arange(len(KEYS)) % 3 == 0, -1, 1).astype(np.int32)
    cb.update_delta_str(s1, KEYS, signs)
    cb.update_delta_str(s2, _buf(), signs)
    assert cb.serialize(s1) == cb.serialize(s2)


def test_hll_kmv_cms_strbuf_parity():
    hll = HLLSketch(HLLParams(b=12))
    a, b = hll.empty(), hll.empty()
    hll.update_str(a, KEYS)
    hll.update_str(b, _buf())
    assert hll.serialize(a) == hll.serialize(b)
    kmv = KMVSketch(KMVParams(k=64))
    a, b = kmv.empty(), kmv.empty()
    kmv.update_str(a, KEYS)
    kmv.update_str(b, _buf())
    assert kmv.serialize(a) == kmv.serialize(b)
    cms = CMSSketch(CMSParams(eps=0.01, delta=0.01))
    a, b = cms.empty(), cms.empty()
    cms.update_str(a, KEYS)
    cms.update_str(b, _buf())
    assert cms.serialize(a) == cms.serialize(b)


def test_spark_str_build_probe_end_to_end(spark):
    """DataFrame str-keyed build (mapInArrow StrBuf path) must produce the
    EXACT state of a driver-side list build, and membership_scan must count
    exactly (zero FN over inserted ids, nulls skipped)."""
    from bloom_filter_spark.operators.build import build_sketch
    from bloom_filter_spark.operators.probe import membership_scan
    ids = [f"doc_{i:05d}" for i in range(4000)]
    rows = [(i,) for i in ids] + [(None,)]
    df = spark.createDataFrame(rows, "id string").repartition(7)
    sk = BloomSketch(BloomParams(n=8000, p=0.01))
    blob, n = build_sketch(df, sk, "id", value_kind="str")
    assert n == len(ids)
    ref = sk.empty()
    sk.update_str(ref, ids)
    assert blob == sk.serialize(ref)
    out = (membership_scan(df, "id", spark, blob, "bloom", value_kind="str")
           .groupBy().sum().collect()[0])
    assert out[0] == len(ids) and out[1] == len(ids)  # zero FN, null skipped


def test_arrow_strbuf_null_buffers_all_empty_keys():
    """n > 0 rows with NULL offsets/data buffers (legal Arrow layout for
    all-empty values) are n EMPTY keys — they hash and count, they do not
    vanish (code-review r5)."""
    n = 5
    off = pa.py_buffer(np.zeros(n + 1, np.int32).tobytes())
    # this pyarrow build rejects a NULL data buffer at construction, so the
    # closest constructible layout is a zero-length data buffer; the
    # None-buffer branches in arrow_strbuf remain as defensive handling for
    # IPC-produced arrays that skip validation
    arr = pa.Array.from_buffers(pa.string(), n, [None, off, pa.py_buffer(b"")])
    buf = H.arrow_strbuf(arr)
    assert len(buf) == n
    want = H.hash64_bytes([b""] * n)
    assert np.array_equal(H.hash64_str(buf), want)
    assert np.array_equal(H.hash64_str(H.arrow_strbuf(pa.array([""] * n))),
                          want)


def test_arrow_strbuf_none_buffer_branches_via_stub():
    """This pyarrow build refuses to CONSTRUCT arrays with NULL
    offsets/data buffers, but other Arrow producers (IPC) can ship them —
    drive arrow_strbuf's None-buffer branches directly through a minimal
    stub exposing the attribute surface it reads (code-review r5)."""
    class _Stub:
        type = pa.string()
        null_count = 0
        offset = 0
        def __init__(self, n, bufs):
            self._n, self._bufs = n, bufs
        def __len__(self):
            return self._n
        def buffers(self):
            return self._bufs

    want = H.hash64_bytes([b""] * 4)
    # offsets None, data None → 4 empty keys
    b1 = H.arrow_strbuf(_Stub(4, [None, None, None]))
    assert len(b1) == 4 and np.array_equal(H.hash64_str(b1), want)
    # offsets present (all zero), data None → 4 empty keys
    off = pa.py_buffer(np.zeros(5, np.int32).tobytes())
    b2 = H.arrow_strbuf(_Stub(4, [None, off, None]))
    assert len(b2) == 4 and np.array_equal(H.hash64_str(b2), want)

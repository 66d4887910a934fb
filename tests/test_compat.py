"""Reference-API facade: the Go library's demo workload (main.go:23-52)
re-run through the 1:1 compat surface."""

import numpy as np
import pytest

from bloom_filter_spark.compat import BlockedBloomFilter, BloomFilter, CuckooFilter


def _random_strings(rng, n, max_len=40):
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789"))
    return ["".join(rng.choice(alphabet, size=rng.integers(1, max_len)))
            for _ in range(n)]


def test_main_go_workload():
    # build Bloom(n, p=0.01), insert random strings, zero FN, count FP
    rng = np.random.default_rng(42)
    n = 20_000
    f = BloomFilter(n, 0.01)
    items = _random_strings(rng, n)
    f.insert_many(items)
    assert f.exist_many(items).all()                      # main.go:39-43
    foreign = [f"zz_{i}_foreign" for i in range(10_000)]
    fpr = f.exist_many(foreign).mean()                    # main.go:45-52
    assert fpr <= 0.01
    assert f.m == (1 << 18) and f.k == 7                  # sizing parity


def test_single_key_api_and_serde():
    f = BloomFilter(1000, 0.05)
    f.insert("hello")
    f.insert(b"raw-bytes")
    f.insert(42)
    assert f.exist("hello") and f.exist(b"raw-bytes") and f.exist(42)
    assert not f.exist("absent-key-xyz")
    g = BloomFilter.deserialize(f.serialize())
    assert g.exist("hello") and g.exist(42) and not g.exist("absent-key-xyz")


def test_merge_extension():
    a, b = BloomFilter(1000, 0.01), BloomFilter(1000, 0.01)
    a.insert("only-a")
    b.insert("only-b")
    a.merge(b)
    assert a.exist("only-a") and a.exist("only-b")


def test_blocked_bloom_facade():
    f = BlockedBloomFilter(5000, 0.01)
    f.insert_many(np.arange(5000, dtype=np.int32))
    assert f.exist(17) and f.exist_many(np.arange(5000, dtype=np.int32)).all()
    g = BlockedBloomFilter.deserialize(f.serialize())
    assert g.exist(17)


def test_cuckoo_facade_insert_lookup_delete():
    cf = CuckooFilter(1000, 0.8)
    assert cf.insert("key-1") and cf.insert("key-1")  # duplicates allowed
    assert cf.lookup("key-1")
    assert cf.delete("key-1")
    assert cf.lookup("key-1")      # one copy left (multiset)
    assert cf.delete("key-1")
    assert not cf.delete("key-1")  # nothing left
    g = CuckooFilter.deserialize(cf.serialize())
    assert not g.lookup("key-1")


def test_compat_parity_hash_families():
    """The 1:1 facade exposes the reference-parity hash modes: a filter
    built in xxh3/metro mode round-trips through deserialize(hash_family=)
    and probes identically (the byte-level Go-blob parity itself is proven
    in tests/test_xxh3.py / tests/test_metro.py)."""
    from bloom_filter_spark import compat
    f = compat.BloomFilter(1000, 0.01, seed=0, hash_family="xxh3")
    for k in (1, 2**40 + 7):
        f.insert(k)
    f.insert(b"short-key")
    blob = f.serialize()
    g = compat.BloomFilter.deserialize(blob, hash_family="xxh3")
    assert g.exist(1) and g.exist(2**40 + 7) and g.exist(b"short-key")

    c = compat.CuckooFilter(256, 0.8, hash_family="metro")
    c.insert(b"alpha")
    c.insert(42)
    blob = c.serialize()
    d = compat.CuckooFilter.deserialize(blob, hash_family="metro")
    assert d.lookup(b"alpha") and d.lookup(42)
    assert d.delete(b"alpha") and not d.delete(b"never-inserted")

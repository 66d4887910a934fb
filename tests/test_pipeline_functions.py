"""Training-data pipeline operator tests over the sf0.001 documents /
embeddings tables (500 rows — fast, deterministic)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloom_filter_spark.functions import dedup, multimodal, similarity, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def exact_pairs(docs):
    return {(r.doc_a, r.doc_b): r.jaccard
            for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}


def test_exact_dedup_groups(docs):
    out = dedup.exact_dedup(docs)
    assert out.count() == out.select("text_hash").distinct().count()
    assert out.agg(F.sum("n_copies")).collect()[0][0] == docs.count()


def test_minhash_lsh_recall_equals_exact(docs, exact_pairs):
    got = {(int(r.doc_a), int(r.doc_b)): r.jaccard
           for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    want = {(int(a), int(b)): j for (a, b), j in exact_pairs.items()}
    assert got == want  # certain recall at this band/row config (see module doc)


def test_simhash_catches_neardups(docs, exact_pairs):
    got = {(int(r.doc_a), int(r.doc_b)) for r in
           dedup.simhash_pairs(docs, max_hamming=7).collect()}
    strong = {(int(a), int(b)) for (a, b), j in exact_pairs.items() if j >= 0.9}
    # every strong near-dup pair must be caught; a few extras are acceptable
    missed = strong - got
    assert not missed, f"simhash missed strong near-dups: {missed}"


def test_brute_force_topk_shape_and_selfcheck(emb):
    out = similarity.brute_force_topk(emb, [0, 1, 2], k=5).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        sims = [r.sim for r in sorted(rows, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in rows)


def test_lsh_topk_recall(emb):
    brute = similarity.brute_force_topk(emb, list(range(10)), k=5).collect()
    approx = similarity.lsh_topk(emb, list(range(10)), k=5).collect()
    b = {(r.query_id, r.neighbor_id) for r in brute}
    a = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(a & b) / len(b)
    assert recall >= 0.5, f"LSH recall collapsed: {recall}"
    assert len(approx) == 50  # k candidates found for every query


def test_embedding_neardup_symmetric_threshold(emb):
    pairs = similarity.neardup_pairs(emb, threshold=0.45).collect()
    for r in pairs:
        assert r.id_a < r.id_b and r.sim >= 0.45


def test_token_count_consistency(docs):
    out = textstats.token_count(docs).collect()
    for r in out:
        assert r.n_distinct_words <= r.n_words
        assert r.n_chars_check >= r.n_words  # words + separators


def test_quality_buckets_cover(docs):
    out = textstats.quality_score(docs)
    rows = out.collect()
    assert all(0 <= r.quality <= 1.0001 for r in rows)
    assert out.where(F.col("quality_bucket").isin("high", "mid", "low")).count() == len(rows)


def test_fingerprint_is_word_set_invariant(spark):
    df = spark.createDataFrame(
        [(1, "b a a b c"), (2, "c b a"), (3, "a b d")],
        "doc_id long, text string")
    out = {r.doc_id: r.fingerprint for r in textstats.fingerprint(df).collect()}
    assert out[1] == out[2]  # same word set, different order/multiplicity
    assert out[1] != out[3]


def test_langid_profiles(spark):
    df = spark.createDataFrame([
        (1, "the cat and the dog are in the house for the winter"),
        (2, "der hund und die katze sind schon in der schule ich"),
        (3, "la casa de la madre que esta en el centro una bonita"),
        (4, "xqz zzk qqp"),
    ], "doc_id long, text string")
    out = {r.doc_id: r.lang_pred for r in textstats.lang_id(df).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "es" and out[4] == "und"


def test_multimodal_plumbing(docs):
    payload = multimodal.attach_binary_payload(docs)
    row = payload.limit(1).collect()[0]
    assert isinstance(bytes(row.payload), bytes) and row.meta.mime == "image/fake"
    feats = multimodal.extract_features(payload)
    got = feats.limit(10).collect()
    for r in got:
        assert r.n_bytes > 0 and 0 < r.n_distinct_bytes <= 256
        assert 0 <= r.entropy <= 8
        assert abs(r.fake_width * r.fake_height - r.n_bytes) <= r.fake_width
    frames = multimodal.frame_sample_stub(payload).limit(5).collect()
    for r in frames:
        assert r.n_sampled == (r.n_frames + 15) // 16


def test_bpe_token_count_counts_punct(spark):
    df = spark.createDataFrame([(1, "hello world42 foo-bar!")], "doc_id long, text string")
    # hello | world | 42 | foo | - | bar | !  = 7
    assert textstats.token_count_bpe(df).collect()[0].n_bpe_tokens == 7

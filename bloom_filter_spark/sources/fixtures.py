"""Deterministic synthetic token-table fixtures (FIXTURES.md F1/F2/F4).

The north-rule input table — (doc_id string, tokens array<int32>,
n_tok int32, source string) — does not exist in /root/testdata (those are the
TPC-H-ish oracle tables), so it is synthesized here exactly as FIXTURES.md
specifies: seed 42, token length ~ Uniform[1, 512], values Zipf(s=1.1)
clipped to vocab [0, 50257), 8 sources with skewed weights, plus the F4 edge
rows.  Generation is chunked with per-chunk derived seeds so the output is
byte-deterministic regardless of chunking, and written with a streaming
pyarrow ParquetWriter so sf0.1 (~150M tokens) never materializes in memory.

Scale mapping mirrors TESTDATA.md: rows = 6_000_000 × sf
(sf0.001 → 6,000 rows ≈ 1.5M tokens; sf0.01 → 60,000; sf0.1 → 600,000).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
PROBE_SEED = 43
VOCAB = 50_257
MAX_LEN = 512
ZIPF_S = 1.1
SOURCES = [f"src_{i:02d}" for i in range(8)]
SOURCE_WEIGHTS = [0.45, 0.25, 0.12, 0.08, 0.05, 0.03, 0.015, 0.005]
N_PROBES = 10_000
ABSENT_LO, ABSENT_HI = 60_000, 2**31  # vocab < 50_257 ⇒ guaranteed absent
CHUNK_ROWS = 6_250  # one parquet row group per chunk ⇒ 96 scan splits at sf0.1
                    # (3 full waves on 32 cores; balance matters for scaling)

FIXTURE_ROOT = os.environ.get(
    "SPARK_GRAFT_FIXTURE_ROOT", os.path.join(os.path.dirname(__file__), "..", "..", ".fixtures")
)

TOKEN_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])

EDGE_ROWS = [  # FIXTURES.md F4
    ("edge_empty", [], "src_07"),
    ("edge_single", [42], "src_07"),
    ("edge_zero_tok", [0], "src_07"),
    ("edge_dup", [7, 7, 7, 7, 7], "src_07"),
    ("edge_maxint", [2147483647, -2147483648], "src_07"),
]


def rows_for_sf(sf_name: str) -> int:
    sf = float(sf_name.removeprefix("sf"))
    return max(int(round(6_000_000 * sf)), 100)


def _gen_chunk(chunk_idx: int, start_row: int, n_rows: int):
    rng = np.random.default_rng([SEED, chunk_idx])
    lengths = rng.integers(1, MAX_LEN + 1, n_rows)
    total = int(lengths.sum())
    vals = rng.zipf(ZIPF_S, total)
    tokens = np.minimum(vals - 1, VOCAB - 1).astype(np.int32)
    src_idx = rng.choice(8, n_rows, p=SOURCE_WEIGHTS)
    doc_ids = [f"doc_{i:010d}" for i in range(start_row, start_row + n_rows)]
    offsets = np.zeros(n_rows + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    token_arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(tokens))
    return pa.table({
        "doc_id": pa.array(doc_ids),
        "tokens": token_arr,
        "n_tok": pa.array(lengths.astype(np.int32)),
        "source": pa.array([SOURCES[i] for i in src_idx]),
    }, schema=TOKEN_SCHEMA), tokens


def generate(sf_name: str, out_dir: str) -> None:
    """Write tokens.parquet + probe tables for one scale into out_dir."""
    n_rows = rows_for_sf(sf_name)
    os.makedirs(out_dir, exist_ok=True)
    seen = np.zeros(VOCAB, dtype=bool)
    tok_path = os.path.join(out_dir, "tokens.parquet")
    with pq.ParquetWriter(tok_path, TOKEN_SCHEMA, compression="zstd") as w:
        start = 0
        chunk_idx = 0
        while start < n_rows:
            n = min(CHUNK_ROWS, n_rows - start)
            table, flat = _gen_chunk(chunk_idx, start, n)
            seen[np.unique(flat)] = True
            w.write_table(table)
            start += n
            chunk_idx += 1
        # F4 edge rows
        edge = pa.table({
            "doc_id": pa.array([r[0] for r in EDGE_ROWS]),
            "tokens": pa.array([r[1] for r in EDGE_ROWS], pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) for r in EDGE_ROWS], pa.int32()),
            "source": pa.array([r[2] for r in EDGE_ROWS]),
        }, schema=TOKEN_SCHEMA)
        w.write_table(edge)
        for r in EDGE_ROWS:
            for t in r[1]:
                if 0 <= t < VOCAB:
                    seen[t] = True

    # F2 probe tables
    rng = np.random.default_rng([PROBE_SEED, n_rows])
    present_pool = np.flatnonzero(seen).astype(np.int32)
    k = min(N_PROBES, present_pool.size)
    present = rng.choice(present_pool, size=k, replace=False)
    absent = rng.integers(ABSENT_LO, ABSENT_HI, N_PROBES).astype(np.int32)
    pq.write_table(pa.table({"token": pa.array(present, pa.int32()),
                             "expected": pa.array(np.ones(k, bool))}),
                   os.path.join(out_dir, "probes_present.parquet"))
    pq.write_table(pa.table({"token": pa.array(absent, pa.int32()),
                             "expected": pa.array(np.zeros(N_PROBES, bool))}),
                   os.path.join(out_dir, "probes_absent.parquet"))
    # doc-level probes (string keys, mirroring the reference's string-keyed runs)
    doc_sample = rng.integers(0, n_rows, min(N_PROBES, n_rows))
    pq.write_table(pa.table({"doc_id": pa.array([f"doc_{i:010d}" for i in doc_sample]),
                             "expected": pa.array(np.ones(doc_sample.size, bool))}),
                   os.path.join(out_dir, "doc_probes_present.parquet"))
    pq.write_table(pa.table({"doc_id": pa.array([f"ghost_{i}" for i in range(N_PROBES)]),
                             "expected": pa.array(np.zeros(N_PROBES, bool))}),
                   os.path.join(out_dir, "doc_probes_absent.parquet"))


def ensure_fixtures(sf_name: str, root: str | None = None) -> str:
    """Idempotent, race-safe fixture materialization; returns the scale dir."""
    root = os.path.abspath(root or FIXTURE_ROOT)
    final = os.path.join(root, sf_name)
    marker = os.path.join(final, "_SUCCESS")
    if os.path.exists(marker):
        return final
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".{sf_name}_", dir=root)
    try:
        generate(sf_name, tmp)
        try:
            os.rename(tmp, final)  # fast path: we own the whole scale dir
        except OSError:
            if not os.path.exists(marker):
                # dir already exists — either we lost a create race (marker
                # appears, nothing to do) or the docs/embeddings twins
                # landed first (ensure_doc_fixtures shares the scale dir
                # under its own _SUCCESS_DOCS marker): land each file via
                # atomic per-file replace, the marker last — the same
                # coexistence strategy the docs side already uses
                os.makedirs(final, exist_ok=True)
                for f in sorted(os.listdir(tmp)):
                    os.replace(os.path.join(tmp, f), os.path.join(final, f))
        open(marker, "w").close()
    finally:
        if os.path.exists(tmp) and os.path.exists(marker) and tmp != final:
            shutil.rmtree(tmp, ignore_errors=True)
    return final


# ---------------------------------------------------------------------------
# documents/embeddings fixture twins (verdict r2 #3): the driver testdata
# caps documents at 5,000 and embeddings at 2,000 rows even at sf0.1, so the
# dedup/ANN operators had never run above that.  These synthesize the same
# SCHEMA and workload shape — zipfian word salad with planted exact-dup and
# near-dup families; unit vectors in 16 spherical clusters with planted
# high-cosine pairs — deterministically (chunk-derived seeds) at any sf.
DOC_ROWS_PER_SF = 50_000       # sf0.1 → 5,000 (matches testdata); sf1 → 50,000
EMB_ROWS_PER_SF = 20_000       # sf0.1 → 2,000;                    sf1 → 20,000
DOC_VOCAB = ("key agg row scan slow fast table value part hash merge batch "
             "spark order data column join small line customer query big "
             "the a group sort window filter stream vector shuffle stage "
             "task executor driver broadcast skew salt bucket codegen arrow "
             "pandas numpy sketch bloom bit array index probe insert delete "
             "union state store commit offset epoch trigger sink source "
             "schema field type cast alias limit sample cache persist "
             "checkpoint plan cost rule prune push project exchange").split()
DOC_LANGS = ["en", "de", "es", "fr"]
EMB_DIM = 64
EMB_CLUSTERS = 16
DOC_CHUNK = 10_000

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int64()),
])
EMB_SCHEMA = pa.schema([
    ("vec_id", pa.int64()),
    ("embedding", pa.list_(pa.float32())),
    ("label", pa.int32()),
])


def _gen_doc_chunk(chunk_idx: int, start: int, n: int) -> pa.Table:
    rng = np.random.default_rng([SEED, 7001, chunk_idx])
    zipf_w = 1.0 / np.arange(1, len(DOC_VOCAB) + 1) ** 0.4
    zipf_w /= zipf_w.sum()
    texts: list[str] = []
    for i in range(n):
        gid = start + i
        if gid % 50 == 49 and texts:
            texts.append(texts[-1])                # exact duplicate
            continue
        if gid % 20 == 19 and texts:               # near-dup: ~10% word swap
            words = texts[-1].split()
            k = max(1, len(words) // 10)
            pos = rng.integers(0, len(words), k)
            repl = rng.choice(len(DOC_VOCAB), k, p=zipf_w)
            for p_, r_ in zip(pos, repl):
                words[int(p_)] = DOC_VOCAB[int(r_)]
            texts.append(" ".join(words))
            continue
        ln = int(rng.integers(30, 121))
        idx = rng.choice(len(DOC_VOCAB), ln, p=zipf_w)
        words = [DOC_VOCAB[j] for j in idx]
        # hapax-rich long tail (real corpora are; without it the 3-gram
        # shingle space saturates and every shingle goes hot): ~25% of
        # positions carry a word from a 10^6-id tail, so most shingles
        # are near-unique and the inverted-index df distribution matches
        # real text instead of an 80-word closed world
        tail_pos = np.flatnonzero(rng.random(ln) < 0.25)
        tail_ids = rng.integers(0, 1_000_000, tail_pos.size)
        for p_, t_ in zip(tail_pos, tail_ids):
            words[int(p_)] = f"w{int(t_)}"
        texts.append(" ".join(words))
    langs = [DOC_LANGS[int(x)] for x in rng.choice(4, n, p=[0.6, 0.2, 0.12, 0.08])]
    srcs = [SOURCES[int(x)] for x in rng.choice(8, n, p=SOURCE_WEIGHTS)]
    return pa.table({
        "doc_id": pa.array(np.arange(start, start + n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(srcs),
        "n_chars": pa.array(np.fromiter((len(t) for t in texts), np.int64, n)),
    }, schema=DOC_SCHEMA)


def _gen_emb_chunk(chunk_idx: int, start: int, n: int,
                   centroids: np.ndarray) -> pa.Table:
    rng = np.random.default_rng([SEED, 7002, chunk_idx])
    cl = rng.integers(0, EMB_CLUSTERS, n)
    v = centroids[cl] + 0.6 * rng.standard_normal((n, EMB_DIM))
    # planted near-dup pairs: vector 100k+1 ≈ vector 100k (cosine ~0.95)
    ids = np.arange(start, start + n)
    for j in np.flatnonzero((ids % 100 == 1) & (ids > 0)):
        if j > 0:
            v[j] = v[j - 1] + 0.1 * rng.standard_normal(EMB_DIM)
            cl[j] = cl[j - 1]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    flat = v.astype(np.float32).ravel()
    offsets = pa.array(np.arange(0, (n + 1) * EMB_DIM, EMB_DIM, dtype=np.int32))
    return pa.table({
        "vec_id": pa.array(ids.astype(np.int64)),
        "embedding": pa.ListArray.from_arrays(offsets, pa.array(flat, pa.float32())),
        "label": pa.array((cl % 3).astype(np.int32)),
    }, schema=EMB_SCHEMA)


def generate_docs_embeddings(sf_name: str, out_dir: str) -> None:
    sf = float(sf_name.removeprefix("sf"))
    n_docs = max(int(round(DOC_ROWS_PER_SF * sf)), 500)
    n_emb = max(int(round(EMB_ROWS_PER_SF * sf)), 500)
    os.makedirs(out_dir, exist_ok=True)
    with pq.ParquetWriter(os.path.join(out_dir, "documents.parquet"),
                          DOC_SCHEMA, compression="zstd") as w:
        start, ci = 0, 0
        while start < n_docs:
            n = min(DOC_CHUNK, n_docs - start)
            w.write_table(_gen_doc_chunk(ci, start, n))
            start += n
            ci += 1
    crng = np.random.default_rng([SEED, 7000])
    centroids = crng.standard_normal((EMB_CLUSTERS, EMB_DIM))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    with pq.ParquetWriter(os.path.join(out_dir, "embeddings.parquet"),
                          EMB_SCHEMA, compression="zstd") as w:
        start, ci = 0, 0
        while start < n_emb:
            n = min(DOC_CHUNK, n_emb - start)
            w.write_table(_gen_emb_chunk(ci, start, n, centroids))
            start += n
            ci += 1


def ensure_doc_fixtures(sf_name: str, root: str | None = None) -> str:
    """Idempotent documents/embeddings twins in the fixture scale dir
    (separate marker — token fixtures may already exist there).

    Race-safe like ensure_fixtures: generation happens in a scratch dir and
    each parquet lands via atomic os.replace, so a concurrent writer can
    never leave a half-written file behind a present marker (content is
    deterministic, so last-replace-wins is byte-identical)."""
    root = os.path.abspath(root or FIXTURE_ROOT)
    final = os.path.join(root, sf_name)
    marker = os.path.join(final, "_SUCCESS_DOCS")
    if os.path.exists(marker):
        return final
    os.makedirs(final, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".{sf_name}_docs_", dir=root)
    try:
        generate_docs_embeddings(sf_name, tmp)
        for f in ("documents.parquet", "embeddings.parquet"):
            os.replace(os.path.join(tmp, f), os.path.join(final, f))
        open(marker, "w").close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return final


def sf_name_of_dir(sf_dir: str) -> str:
    """Map a driver-style testdata dir (/root/testdata/sf0.01) to a scale name."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base.startswith("sf") else "sf0.001"


def token_table_path(sf_dir: str, root: str | None = None) -> str:
    return os.path.join(ensure_fixtures(sf_name_of_dir(sf_dir), root), "tokens.parquet")


def probe_tables_path(sf_dir: str, root: str | None = None) -> str:
    return ensure_fixtures(sf_name_of_dir(sf_dir), root)

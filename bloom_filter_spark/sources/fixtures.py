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
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        try:
            os.rename(tmp, final)
        except OSError:
            if not os.path.exists(marker):  # genuine failure, not a race
                raise
    finally:
        if os.path.exists(tmp) and os.path.exists(marker) and tmp != final:
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

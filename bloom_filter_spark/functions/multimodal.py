"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake / NotImplementedError per the build brief) while the
Spark-side plumbing is real and tested: binary column schema, typed metadata
struct, Arrow batch shape through mapInPandas, and partition-friendly feature
extraction.  Swapping `_decode_stub` for a real codec (PIL / torchaudio) is
the only change needed on a production cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = ("doc_id string, n_bytes long, n_distinct_bytes int, "
                  "entropy double, fake_width int, fake_height int")


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload binary + typed metadata struct.
    In production this column comes from the lakehouse (e.g. image bytes)."""
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(F.col(text_col)).alias("size"),
        ).alias("meta"),
    )


def _decode_stub(buf: np.ndarray) -> tuple[int, int]:
    """Deterministic fake decoder: derives a (width, height) from the byte
    length as a real image decode would.  Replace with PIL/libvips on a
    cluster with codecs installed."""
    n = int(buf.size)
    w = max(int(np.sqrt(n)), 1)
    return w, max(n // w, 1)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column: byte stats +
    (stubbed) decode dims.

    Fully vectorized per Arrow batch — all payloads are concatenated into ONE
    byte buffer and per-doc byte histograms accumulated with a single
    owner-indexed ``np.add.at`` over (owner, byte) pairs (the same
    owner-index trick as simhash in dedup.py); no per-row Python loop.
    """
    def feats(it):
        for pdf in it:
            if not len(pdf):
                continue
            payloads = pdf["payload"].to_numpy()
            lens = np.fromiter((len(p) for p in payloads), np.int64, len(payloads))
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            owner = np.repeat(np.arange(len(payloads)), lens)
            # (n_docs, 256) histogram in one vectorized scatter-add
            counts = np.zeros((len(payloads), 256), np.int64)
            np.add.at(counts, (owner, flat), 1)
            nz = counts > 0
            denom = np.maximum(lens, 1).astype(np.float64)[:, None]
            probs = np.where(nz, counts / denom, 1.0)  # log2(1)=0 for zeros
            # + 0.0 normalizes the -0.0 an all-zero row sum would negate to
            entropy = -(np.where(nz, probs * np.log2(probs), 0.0)).sum(axis=1) + 0.0
            widths = np.maximum(np.sqrt(lens).astype(np.int64), 1)
            heights = np.maximum(lens // widths, 1)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": lens,
                "n_distinct_bytes": nz.sum(axis=1).astype(np.int32),
                "entropy": np.round(entropy, 6),
                "fake_width": widths.astype(np.int32),
                "fake_height": heights.astype(np.int32),
            })

    return df.select("doc_id", "payload").mapInPandas(feats, FEATURE_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 16) -> DataFrame:
    """Video-style frame sampling plumbing: slices the payload into fixed
    windows ('frames') and keeps every n-th — schema and batching are real,
    the decode is the same stub."""
    def frames(it):
        for pdf in it:
            if not len(pdf):
                continue
            lens = pdf["payload"].map(len).to_numpy(np.int64)
            n_frames = np.maximum(lens // 16, 1)
            n_sampled = -(-n_frames // every_n)  # ceil-div, no row loop
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "n_frames": n_frames,
                                "n_sampled": n_sampled})

    return df.select("doc_id", "payload").mapInPandas(
        frames, "doc_id string, n_frames long, n_sampled long")

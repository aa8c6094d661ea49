"""Multimodal (binary) column plumbing.

Image/audio/video payloads are opaque `binary` columns with a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
mapInPandas. The decode kernels themselves are STUBBED (no media
libraries in this container — a real deployment drops cv2/PIL/ffmpeg
into `_decode_image`); everything Spark-side — schema, batching,
partitioning, UDF signatures — is real and tested.

The md5/byte-stat extractor is deterministic, which lets the catalog
query (m1) cross-check the whole binary pipeline against a DuckDB
oracle even though it runs through Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal row: utf-8 bytes of the text as the
    payload + typed metadata struct (the schema real media would use).
    """
    return df.withColumn("content", F.col(text_col).cast("binary")).withColumn(
        "meta",
        F.struct(
            F.length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ),
    )


def _decode_image(payload: bytes) -> None:
    """Stub: decode an image payload to HxWxC. Requires a media
    library absent from this container."""
    raise NotImplementedError("image decode requires cv2/PIL; stubbed by design")


def extract_binary_features(
    df: DataFrame, key_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """mapInPandas feature extractor over binary payloads.

    Emits (key, content_md5, n_bytes, head_bytes) — deterministic
    byte-level features standing in for decode+embed; the Arrow
    round-trip of binary columns is the part under test.
    """
    schema = f"{key_col} long, content_md5 string, n_bytes long, head_sum long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf[content_col]
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col].to_numpy(),
                    "content_md5": [hashlib.md5(b).hexdigest() for b in payloads],
                    "n_bytes": [len(b) for b in payloads],
                    "head_sum": [sum(b[:8]) for b in payloads],
                }
            )

    return df.mapInPandas(run, schema)


def _decode_video_frames(payload: bytes, n_frames: int):
    """Stub: decode + uniformly frame-sample a video payload.
    Requires ffmpeg/av, absent from this container by design."""
    raise NotImplementedError("video decode requires ffmpeg/av; stubbed by design")


def sample_frames(
    df: DataFrame,
    key_col: str = "doc_id",
    content_col: str = "content",
    n_frames: int = 4,
) -> DataFrame:
    """Frame-sampling plumbing: one input payload → n_frames output
    rows (the 1→N generator shape video pipelines need). The decode
    kernel is stubbed with a deterministic byte-slice 'frame' so the
    row-explosion, schema, and Arrow batching are real and testable;
    `_decode_video_frames` is the swap point for a real codec.
    """
    schema = f"{key_col} long, frame_idx long, frame_md5 string, frame_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            keys, idxs, md5s, sizes = [], [], [], []
            for key, payload in zip(pdf[key_col], pdf[content_col]):
                n = len(payload)
                for f in range(n_frames):
                    # deterministic fake frame: the f-th of n_frames
                    # contiguous byte slices
                    lo = (n * f) // n_frames
                    hi = (n * (f + 1)) // n_frames
                    frame = bytes(payload[lo:hi])
                    keys.append(key)
                    idxs.append(f)
                    md5s.append(hashlib.md5(frame).hexdigest())
                    sizes.append(len(frame))
            yield pd.DataFrame(
                {key_col: keys, "frame_idx": idxs, "frame_md5": md5s,
                 "frame_bytes": sizes}
            )

    return df.mapInPandas(run, schema)


def nibble_histogram(
    df: DataFrame, key_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Vectorized byte-level signature kernel: the 16-bin histogram of
    high nibbles (byte >> 4) of each payload, via np.frombuffer +
    np.bincount — a REAL numpy kernel (not a stub), the shape a
    decode+feature step takes when the media library lands: Arrow
    hands the batch over zero-copy, the kernel is C-speed per batch,
    and the output is exact integers so the DuckDB oracle replays it
    bit-for-bit.

    Scale: embarrassingly parallel map, zero shuffle; output is
    16 longs + length per row regardless of payload size.
    """
    import numpy as np

    schema = f"{key_col} long, hist array<long>, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            hists = [
                np.bincount(
                    np.frombuffer(bytes(b), dtype=np.uint8) >> 4, minlength=16
                ).astype(np.int64)
                for b in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col].to_numpy(),
                    "hist": hists,
                    "n_bytes": [len(b) for b in pdf[content_col]],
                }
            )

    return df.mapInPandas(run, schema)

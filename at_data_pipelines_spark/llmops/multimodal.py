"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata structs.

The container has no codec libraries (PIL/cv2/librosa), so the actual
decode is STUBBED: ``decode_image_meta`` parses a deterministic fake
header format and raises ``NotImplementedError`` for real formats. The
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partitioning — is real and tested, so swapping a real codec in is a
one-function change.

Fake media format (for tests): ``b"FAKE" + mode(1B) + width(4B LE) +
height(4B LE) + payload``.

Scale notes: binary payloads ride the normal columnar path (parquet binary
+ Arrow); keep per-file row groups small enough that a batch of payloads
fits executor memory (``spark.sql.files.maxPartitionBytes``, and
``maxRecordsPerBatch`` for Arrow). Feature extraction is mapInPandas —
one pass, no shuffle; downstream joins use the extracted metadata, never
the blob.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, mode string, payload_bytes long"
)


def make_fake_image(width: int, height: int, mode: int = 1, payload: bytes = b"") -> bytes:
    return b"FAKE" + struct.pack("<BII", mode, width, height) + payload


def _decode_fake_header(buf: bytes) -> tuple[int, int, str]:
    if buf[:4] != b"FAKE":
        raise NotImplementedError(
            "real image codecs (PNG/JPEG/...) are not available in this "
            "container; only the FAKE test format decodes"
        )
    mode, w, h = struct.unpack("<BII", buf[4:13])
    return w, h, {1: "L", 3: "RGB"}.get(mode, f"M{mode}")


def decode_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode header metadata from image payloads (mapInPandas, Arrow
    batches; per-row python only on the tiny header slice)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf[payload_col]):
                w, h, mode = _decode_fake_header(bytes(buf))
                rows.append((int(mid), w, h, mode, len(buf)))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mode", "payload_bytes"]
            )

    return df.select("media_id", payload_col).mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


def filter_by_min_resolution(features: DataFrame, min_w: int, min_h: int) -> DataFrame:
    return features.filter((F.col("width") >= min_w) & (F.col("height") >= min_h))


def sample_frames(df: DataFrame, every_n: int, frame_col: str = "frame_idx") -> DataFrame:
    """Keep every n-th frame of a video frame table (modulo on the frame
    index — no shuffle, pure filter)."""
    return df.filter((F.col(frame_col) % every_n) == 0)


def extract_embeddings(
    df: DataFrame, payload_col: str = "payload", dim: int = 64
) -> DataFrame:
    """Media → embedding column, the bridge from multimodal payloads to
    the similarity/ANN layer (``llmops.similarity``): output is
    ``(media_id, embedding array<float>)``, the exact input shape of
    ``cosine_topk`` / ``ivf_topk`` / ``cosine_threshold_pairs_blocked``.

    The embedding MODEL is stubbed (no torch/ONNX in this container) with
    a deterministic pseudo-embedding seeded by the payload digest — same
    payload, same vector, so dedup/ANN tests are reproducible. The
    Spark-side shape is the real one: Arrow batches through mapInPandas,
    one batched "inference" call per batch (swap the seeded RNG for a
    model forward pass on GPU executors; signature and partitioning are
    unchanged)."""
    import hashlib

    import numpy as np

    out_schema = "media_id long, embedding array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for buf in pdf[payload_col]:
                seed = int.from_bytes(
                    hashlib.md5(bytes(buf)).digest()[:8], "little"
                )
                vecs.append(
                    np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "embedding": vecs}
            )

    return df.select("media_id", payload_col).mapInPandas(fn, out_schema)


def chunk_audio(
    df: DataFrame, chunk_bytes: int, payload_col: str = "payload"
) -> DataFrame:
    """Split audio payloads into fixed-size chunk rows —
    ``(media_id, chunk_idx, chunk)`` with ``chunk = payload[idx·size :
    (idx+1)·size]`` — entirely JVM-side: offsets from ``sequence``,
    slices via binary ``substr``; no Python touches the blob.

    This is the standard pre-processing shape for long-audio models
    (fixed-window encoders): downstream per-chunk feature extraction
    parallelizes over rows, and ``concat(chunks ORDER BY chunk_idx)``
    reassembles the original exactly (tested)."""
    n_chunks = F.ceil(F.length(F.col(payload_col)) / F.lit(chunk_bytes)).cast("int")
    # guard n_chunks == 0 (empty payload): sequence(0, -1) is DESCENDING
    # in Spark, which would fabricate two bogus chunk rows
    idx = F.explode(
        F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
            F.array().cast("array<int>")
        )
    ).alias("chunk_idx")
    out = df.select("media_id", payload_col, idx)
    chunk = F.expr(f"substring({payload_col}, chunk_idx * {chunk_bytes} + 1, {chunk_bytes})")
    return out.select("media_id", "chunk_idx", chunk.alias("chunk"))

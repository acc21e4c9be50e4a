"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas UDFs over mapInPandas.

The container has no image/audio/video libraries, so modality-specific
decoding is stubbed behind clearly-marked NotImplementedError branches
with a deterministic fallback feature set (byte length + md5) — the
Spark-side contract (schema, batch shape, partition behavior) is real and
tested. Swapping in PIL/librosa/ffmpeg later changes only the body of
``_decode_*``.

Scale notes: mapInPandas streams Arrow batches, so payloads never
materialize as one driver-side blob; keep
``spark.sql.files.maxPartitionBytes`` sized so a partition of payloads
fits executor memory, and repartition by a content-hash prefix when
payload sizes are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("decoder", StringType()),
    ]
)

DECODER_VERSION = "stub-decoder-v0"


def _decode_image(payload: bytes) -> dict[str, Any]:
    raise NotImplementedError(
        "image decode requires PIL/opencv — not in this container; "
        "deterministic byte-level features are used instead"
    )


def _decode_audio(payload: bytes) -> dict[str, Any]:
    raise NotImplementedError(
        "audio decode requires soundfile/librosa — not in this container"
    )


def _decode_video_frames(payload: bytes, every_n: int = 30) -> list[bytes]:
    raise NotImplementedError("video frame sampling requires ffmpeg bindings")


def _byte_features(payload: bytes) -> dict[str, Any]:
    """Deterministic modality-agnostic fallback features."""
    return {
        "n_bytes": len(payload),
        "content_hash": hashlib.md5(payload).hexdigest(),
        "decoder": DECODER_VERSION,
    }


def extract_features(df: DataFrame) -> DataFrame:
    """(doc_id, payload: binary, meta: struct) → FEATURE_SCHEMA rows.

    Tries the mime-appropriate decoder; on NotImplementedError (all
    modalities in this container) falls back to byte-level features so the
    pipeline stays total and deterministic.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                payload = bytes(payload)
                mime = (meta.get("mime") if hasattr(meta, "get") else meta["mime"]) or ""
                try:
                    if mime.startswith("image/"):
                        feats = _decode_image(payload)
                    elif mime.startswith("audio/"):
                        feats = _decode_audio(payload)
                    else:
                        feats = _byte_features(payload)
                except NotImplementedError:
                    feats = _byte_features(payload)
                rows.append({"doc_id": doc_id, **feats})
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_hash", StringType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_size: int = 64, stride: int = 4
) -> DataFrame:
    """(doc_id, payload: binary) → one row per SAMPLED frame: the
    video-frame-sampling plumbing shape (1 input row → N output rows,
    Arrow-batched, schema declared up front).

    A real build calls ``_decode_video_frames`` (ffmpeg) to get pixel
    frames; without media libs the payload is treated as a raw
    fixed-size-frame container — split into ``frame_size``-byte frames,
    keep every ``stride``-th — which keeps the operator total and
    deterministic while exercising the exact production contract.

    Scale notes: frames never leave the executor as one blob (mapInPandas
    streams Arrow batches), the expansion factor is bounded by
    ``1/stride``, and the output carries hashes, not frame bytes, so the
    downstream shuffle is O(frames sampled × 16 bytes).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "frame_len", "frame_hash")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                n_frames = -(-len(payload) // frame_size)
                for idx in range(0, n_frames, stride):
                    frame = payload[idx * frame_size : (idx + 1) * frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_len"].append(len(frame))
                    out["frame_hash"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("resizer", StringType()),
    ]
)


def resize_payloads(df: DataFrame, target_bytes: int = 96) -> DataFrame:
    """(doc_id, payload: binary) → payload resized to a byte budget: the
    image-resize plumbing shape (binary in, smaller binary out, 1:1
    rows, Arrow round-trip both directions).

    A real build decodes pixels and re-encodes at the target resolution
    (``_decode_image`` → PIL thumbnail); without media libs the
    deterministic stand-in is byte truncation to ``target_bytes``, which
    preserves the operator's contract — output payload is never larger
    than the budget, row count is unchanged, and the transform is pure.

    Scale notes: resize SHRINKS data mid-pipeline, so it belongs before
    any shuffle of payloads; binary columns ride Arrow buffers (no
    base64 inflation) and per-batch memory is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` x target size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "payload", "n_bytes", "resizer")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                try:
                    resized = _decode_image(payload)  # pragma: no cover
                    name = DECODER_VERSION
                except NotImplementedError:
                    resized = payload[:target_bytes]
                    name = "stub-truncate-v0"
                out["doc_id"].append(doc_id)
                out["payload"].append(resized)
                out["n_bytes"].append(len(resized))
                out["resizer"].append(name)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)

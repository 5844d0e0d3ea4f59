"""Multimodal column plumbing — extension X5 (SURVEY.md §2b).

Design: image/audio/video payloads are opaque `binary` columns with
typed metadata travelling alongside. The Spark-side plumbing — schema,
Arrow-batched `mapInPandas` UDF signatures, partition-sized batches —
is real and tested; the actual media decode is STUBBED (the container
has no image/audio libraries) behind `decode_media`, which raises
`NotImplementedError`, with a deterministic fake feature extractor used
by tests and queries.

At 100 TB: binary payloads ride in Parquet alongside metadata, the
decode/feature pass is `mapInPandas` (one Arrow batch per ~10k rows, no
per-row Python overhead), and partitioning is by size so a batch of
large videos doesn't OOM an executor (`repartitionByRange` on
byte_len).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import parallelize_narrow

MEDIA_META_DDL = "doc_id BIGINT, media_type STRING, byte_len BIGINT, sha256_16 STRING"
MEDIA_FEATURE_DDL = MEDIA_META_DDL + ", feature ARRAY<DOUBLE>"
FRAME_DDL = "doc_id BIGINT, frame_idx INT, frame_offset BIGINT, frame BINARY"


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in media table: utf-8 bytes of `text` as the opaque payload.

    Real deployments read `spark.read.format('binaryFile')` or Parquet
    with a binary column; the downstream plumbing is identical.
    """
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_media(payload: bytes, media_type: str):  # pragma: no cover - stub
    """STUB: real image/audio decode (PIL/librosa/av are not installed).

    Kept as the single seam where a real decoder plugs in; everything
    around it (batching, schema, partitioning) is live code.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; use fake_features for deterministic plumbing tests"
    )


def fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector: sha256 bytes → dim floats
    in [0,1). Stable across runs/platforms — used to test the pipeline
    end-to-end without a media decoder."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def media_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata pass over binary payloads via mapInPandas:
    (doc_id, media_type, byte_len, sha256_16)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "sha256_16": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]
                    ),
                }
            )

    return parallelize_narrow(media).mapInPandas(batches, schema=MEDIA_META_DDL)


def media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Metadata + deterministic fake feature vector per payload; the
    real decoder would replace `fake_features` inside the same batch
    loop (decode_media seam)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "sha256_16": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]
                    ),
                    "feature": payloads.map(lambda b: fake_features(bytes(b), dim)),
                }
            )

    return parallelize_narrow(media).mapInPandas(batches, schema=MEDIA_FEATURE_DDL)


RESIZED_DDL = "doc_id BIGINT, media_type STRING, orig_len BIGINT, thumb BINARY"


def resize_media(media: DataFrame, thumb_bytes: int = 64) -> DataFrame:
    """Resize/thumbnail pass (stub decode): payload → fixed-size
    representation. The deterministic stand-in truncates-or-pads the
    raw bytes to ``thumb_bytes``; a real implementation decodes,
    resizes, and re-encodes inside the same Arrow batch loop
    (decode_media seam). Output size is constant per row — the property
    downstream training loaders rely on."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"].map(bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "orig_len": payloads.map(len).astype("int64"),
                    "thumb": payloads.map(
                        lambda b: b[:thumb_bytes].ljust(thumb_bytes, b"\x00")
                    ),
                }
            )

    return parallelize_narrow(media).mapInPandas(batches, schema=RESIZED_DDL)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 256,
    stride: int = 4,
) -> DataFrame:
    """Row-expanding frame sampler: one binary payload → every
    ``stride``-th fixed-size frame, with its index and byte offset.

    This is the video-pipeline shape (container → sampled frames → per-
    frame features): the output row count is payload-dependent, so the
    pass must be `mapInPandas` (1→N rows inside one Arrow batch), not a
    scalar UDF. The "demux" here is a deterministic stub — fixed-size
    byte chunks stand in for container frames; a real demuxer (PyAV)
    plugs into the same loop. At scale, follow with repartition on
    (doc_id % shards) before per-frame decode so one long video doesn't
    pin a task.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_offset": [],
                "frame": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max((len(raw) + frame_bytes - 1) // frame_bytes, 1)
                for idx in range(0, n_frames, stride):
                    off = idx * frame_bytes
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_offset"].append(off)
                    out["frame"].append(raw[off : off + frame_bytes])
            yield pd.DataFrame(out)

    return parallelize_narrow(media).mapInPandas(batches, schema=FRAME_DDL)

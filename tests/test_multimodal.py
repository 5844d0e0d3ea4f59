"""Multimodal plumbing: frame sampling and resize passes through the
Arrow seam — geometry, determinism, and 1→N row expansion."""

from __future__ import annotations

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    multimodal,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR


def _media(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return multimodal.attach_binary_payload(docs)


def test_sample_frames_geometry(spark):
    frames = multimodal.sample_frames(_media(spark), frame_bytes=256, stride=4)
    rows = frames.collect()
    assert rows, "no frames produced"
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, fs in by_doc.items():
        idxs = sorted(f["frame_idx"] for f in fs)
        assert idxs[0] == 0
        assert all(i % 4 == 0 for i in idxs)
        for f in fs:
            assert f["frame_offset"] == f["frame_idx"] * 256
            assert len(f["frame"]) <= 256


def test_sample_frames_reassembles_payload_prefix(spark):
    # stride=1: concatenating all frames reproduces the original bytes
    media = _media(spark).limit(20)
    orig = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    frames = multimodal.sample_frames(media, frame_bytes=256, stride=1).collect()
    by_doc: dict[int, dict[int, bytes]] = {}
    for f in frames:
        by_doc.setdefault(f["doc_id"], {})[f["frame_idx"]] = bytes(f["frame"])
    for doc_id, parts in by_doc.items():
        joined = b"".join(parts[i] for i in sorted(parts))
        assert joined == orig[doc_id], doc_id


def test_resize_media_fixed_size_and_deterministic(spark):
    media = _media(spark).limit(50)
    a = {r["doc_id"]: bytes(r["thumb"]) for r in multimodal.resize_media(media).collect()}
    b = {r["doc_id"]: bytes(r["thumb"]) for r in multimodal.resize_media(media).collect()}
    assert a == b
    orig = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    for doc_id, thumb in a.items():
        assert len(thumb) == 64
        raw = orig[doc_id]
        assert thumb == raw[:64].ljust(64, b"\x00")

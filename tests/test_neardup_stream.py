"""Streaming near-dup gate (streaming/neardup_stream.py): cross-batch
near-duplicate suppression backed by the materialized band index."""

from __future__ import annotations

import json

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.neardup_stream import (
    start_neardup_stream,
)

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while seventeen sleepy turtles watch from a mossy log in the sun"
)
OTHER = (
    "completely different text about distributed analytics engines and "
    "columnar storage formats with vectorized execution at warehouse scale"
)


def _write_jsonl(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_streaming_near_dup_across_batches(spark, tmp_path):
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    index_dir = str(tmp_path / "mh_index")
    clean_dir = str(tmp_path / "clean")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two distinct docs + an in-batch near-dup of the first
    _write_jsonl(
        docs_dir / "b1.jsonl",
        [
            {"doc_id": 1, "text": BASE},
            {"doc_id": 2, "text": OTHER},
            {"doc_id": 3, "text": BASE.replace("seventeen", "eighteen")},
        ],
    )
    q = start_neardup_stream(
        spark, str(docs_dir), index_dir, clean_dir, ckpt, min_est_jaccard=0.5
    )
    try:
        q.processAllAvailable()
        kept1 = {r["doc_id"] for r in spark.read.parquet(clean_dir).collect()}
        assert kept1 == {1, 2}  # 3 dropped as in-batch near-dup of 1

        # batch 2: near-dup of an EARLIER batch's doc + a novel doc
        _write_jsonl(
            docs_dir / "b2.jsonl",
            [
                {"doc_id": 10, "text": BASE.replace("turtles", "rabbits")},
                {"doc_id": 11, "text": "entirely novel short document about nothing else"},
            ],
        )
        q.processAllAvailable()
        kept = {r["doc_id"] for r in spark.read.parquet(clean_dir).collect()}
        assert kept == {1, 2, 11}  # 10 caught by the index probe
    finally:
        q.stop()


def test_streaming_near_dup_restart_resumes_from_index(spark, tmp_path):
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    index_dir = str(tmp_path / "mh_index")
    clean_dir = str(tmp_path / "clean")
    ckpt = str(tmp_path / "ckpt")

    _write_jsonl(docs_dir / "b1.jsonl", [{"doc_id": 1, "text": BASE}])
    q = start_neardup_stream(
        spark, str(docs_dir), index_dir, clean_dir, ckpt, min_est_jaccard=0.5
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # restart: the index state survives the process, so a near-dup
    # arriving after restart is still suppressed
    _write_jsonl(
        docs_dir / "b2.jsonl",
        [{"doc_id": 20, "text": BASE.replace("mossy", "rotten")}],
    )
    q2 = start_neardup_stream(
        spark, str(docs_dir), index_dir, clean_dir, ckpt, min_est_jaccard=0.5
    )
    try:
        q2.processAllAvailable()
        kept = {r["doc_id"] for r in spark.read.parquet(clean_dir).collect()}
        assert kept == {1}
    finally:
        q2.stop()


def test_gate_batch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the same batch_id must
    replace the previous attempt, not append duplicates to the clean
    output or the index."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.neardup_stream import (
        _gate_batch,
    )

    index_dir = str(tmp_path / "idx")
    clean_dir = str(tmp_path / "clean")
    batch = spark.createDataFrame(
        [(1, BASE), (2, OTHER)], "doc_id long, text string"
    )
    _gate_batch(spark, batch, 0, index_dir, clean_dir, 0.5)
    _gate_batch(spark, batch, 0, index_dir, clean_dir, 0.5)  # retry

    clean = spark.read.parquet(clean_dir)
    assert clean.count() == 2  # not 4
    idx = spark.read.parquet(index_dir)
    assert idx.groupBy("id", "band_id").count().filter("count > 1").count() == 0

"""Streaming decontamination gate (streaming/decontam_stream.py):
batch parity with cross_set_ngram_overlap, quarantine evidence, and
idempotent per-batch commits."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup import (
    cross_set_ngram_overlap,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.decontam_stream import (
    start_decontam_stream,
)

EVAL_Q = (
    "what is the capital of france and which river flows through paris "
    "on its way to the english channel"
)
CLEAN_DOC = (
    "distributed query engines shuffle data between executors when "
    "aggregations require co-locating keys on the same worker node"
)


def _write_jsonl(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _eval_df(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=100, text=EVAL_Q),
            Row(doc_id=101, text="name every planet in the solar system in order"),
        ]
    )


def test_decontam_stream_matches_batch_operator(spark, tmp_path):
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    clean_dir = str(tmp_path / "clean")
    quarantine_dir = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")

    rows1 = [
        # doc 1 leaks a full eval question inside training text
        {"doc_id": 1, "text": "intro text " + EVAL_Q + " outro text"},
        {"doc_id": 2, "text": CLEAN_DOC},
    ]
    rows2 = [
        # doc 3 leaks the other eval doc; doc 4 is clean
        {"doc_id": 3, "text": "name every planet in the solar system in order please"},
        {"doc_id": 4, "text": "columnar formats prune row groups using footer statistics"},
    ]
    _write_jsonl(docs_dir / "b1.jsonl", rows1)
    eval_set = _eval_df(spark)
    q = start_decontam_stream(
        spark, str(docs_dir), eval_set, clean_dir, quarantine_dir, ckpt, n=5
    )
    try:
        q.processAllAvailable()
        _write_jsonl(docs_dir / "b2.jsonl", rows2)
        q.processAllAvailable()
    finally:
        q.stop()

    kept = {r["doc_id"] for r in spark.read.parquet(clean_dir).collect()}
    quarantined = {
        r["doc_id"]: r for r in spark.read.parquet(quarantine_dir).collect()
    }
    assert kept == {2, 4}
    assert set(quarantined) == {1, 3}
    # evidence columns: matched eval doc + shared-gram count
    assert quarantined[1]["matched_eval_id"] == 100
    assert quarantined[1]["n_shared"] > 0
    assert quarantined[3]["matched_eval_id"] == 101

    # parity: the batch operator flags exactly the quarantined ids
    train = spark.createDataFrame(
        [Row(doc_id=r["doc_id"], text=r["text"]) for r in rows1 + rows2]
    )
    batch_hits = {
        r["train_id"]
        for r in cross_set_ngram_overlap(train, eval_set, n=5).collect()
    }
    assert batch_hits == set(quarantined)


def test_decontam_batch_commit_is_idempotent(spark, tmp_path):
    """Re-running a batch id (at-least-once retry) must replace, not
    duplicate, that batch's output."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.decontam_stream import (
        _gate_batch,
    )

    eval_set = _eval_df(spark)
    eval_grams = eval_set.select(
        F.col("doc_id").alias("eval_id"),
        F.explode(
            __import__(
                "csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup",
                fromlist=["word_shingles_col"],
            ).word_shingles_col("text", 5)
        ).alias("gram"),
    )
    batch = spark.createDataFrame(
        [Row(doc_id=1, text="x " + EVAL_Q), Row(doc_id=2, text=CLEAN_DOC)]
    )
    clean_dir = str(tmp_path / "clean")
    quarantine_dir = str(tmp_path / "quarantine")
    for _ in range(2):  # retry the same batch id
        _gate_batch(batch, 0, eval_grams, clean_dir, quarantine_dir, 5, 1)
    assert spark.read.parquet(clean_dir).count() == 1
    assert spark.read.parquet(quarantine_dir).count() == 1


def test_decontam_stream_restart_resumes(spark, tmp_path):
    """Checkpoint restart: a restarted stream must not reprocess
    committed batches (no duplicate output) and must keep gating new
    ones against the same eval set."""
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    clean_dir = str(tmp_path / "clean")
    quarantine_dir = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")
    eval_set = _eval_df(spark)

    _write_jsonl(docs_dir / "b1.jsonl", [{"doc_id": 1, "text": CLEAN_DOC}])
    q = start_decontam_stream(
        spark, str(docs_dir), eval_set, clean_dir, quarantine_dir, ckpt, n=5
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _write_jsonl(
        docs_dir / "b2.jsonl", [{"doc_id": 2, "text": "prefix " + EVAL_Q}]
    )
    q = start_decontam_stream(
        spark, str(docs_dir), eval_set, clean_dir, quarantine_dir, ckpt, n=5
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    clean = [r["doc_id"] for r in spark.read.parquet(clean_dir).collect()]
    assert sorted(clean) == [1]  # batch 1 not re-emitted, doc 2 gated
    assert [r["doc_id"] for r in spark.read.parquet(quarantine_dir).collect()] == [2]

"""Streaming quality gate (streaming/quality_stream.py): batch-score
parity with the offline classifier and routed evidence."""

from __future__ import annotations

import json

from pyspark.sql import Row

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.classify import (
    prior_milli,
    score_documents,
    train_token_weights,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.quality_stream import (
    start_quality_stream,
)


def _write_jsonl(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_quality_stream_matches_offline_scores(spark, tmp_path):
    # offline: train on a labeled reference corpus
    train = spark.createDataFrame(
        [
            Row(doc_id=0, text="the cat sat on the mat", lang="en"),
            Row(doc_id=1, text="the dog ran to the park", lang="en"),
            Row(doc_id=2, text="le chat noir dort ici", lang="fr"),
            Row(doc_id=3, text="le chien brun court vite", lang="fr"),
        ]
    )
    weights = train_token_weights(train, vocab_size=100)
    prior = prior_milli(train)

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    kept_dir = str(tmp_path / "kept")
    rejected_dir = str(tmp_path / "rejected")
    ckpt = str(tmp_path / "ckpt")

    incoming = [
        {"doc_id": 10, "text": "the cat ran on the mat"},   # en-ish → kept
        {"doc_id": 11, "text": "le chat brun dort vite"},   # fr-ish → rejected
    ]
    _write_jsonl(docs_dir / "b1.jsonl", incoming)
    q = start_quality_stream(
        spark, str(docs_dir), weights, prior, kept_dir, rejected_dir, ckpt
    )
    try:
        q.processAllAvailable()
        # second batch keeps gating after the first committed
        _write_jsonl(
            docs_dir / "b2.jsonl",
            [{"doc_id": 12, "text": "the dog sat in the park"}],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    kept = {r["doc_id"]: r for r in spark.read.parquet(kept_dir).collect()}
    rejected = {r["doc_id"]: r for r in spark.read.parquet(rejected_dir).collect()}
    assert set(kept) == {10, 12}
    assert set(rejected) == {11}
    assert rejected[11]["score_milli"] < 0  # evidence rides with the doc

    # parity: streamed scores == the batch operator's scores
    stream_scores = {
        d: r["score_milli"] for d, r in {**kept, **rejected}.items()
    }
    batch_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"], None) for r in incoming]
        + [(12, "the dog sat in the park", None)],
        "doc_id long, text string, lang string",
    )
    offline = {
        r["doc_id"]: r["score_milli"]
        for r in score_documents(batch_docs, weights, prior).collect()
    }
    assert stream_scores == offline

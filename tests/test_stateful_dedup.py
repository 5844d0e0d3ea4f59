"""Cross-batch stateful streaming dedup: feed two micro-batches where
batch 2 re-sends a batch-1 document; the duplicate must be detected
against state, not just within the batch.
"""

from __future__ import annotations

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming import (
    streaming_exact_dedup,
)


def test_cross_batch_duplicate_detected(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    batch1 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")], "doc_id long, text string"
    )
    batch2 = spark.createDataFrame(
        [(3, "ALPHA   beta gamma"), (4, "zeta eta")], "doc_id long, text string"
    )  # doc 3 normalizes equal to doc 1 → cross-batch duplicate

    batch1.write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "100")
        .parquet(str(src / "*"))
    )
    out = streaming_exact_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        batch2.write.mode("append").parquet(str(src / "b2"))
        q.processAllAvailable()
        rows = spark.sql(
            "select content_hash, first_doc_id, n_duplicates from dedup_state"
        ).collect()
    finally:
        q.stop()

    # latest state per hash (memory sink in update mode appends; take max)
    latest: dict = {}
    for r in rows:
        h = r["content_hash"]
        if h not in latest or r["n_duplicates"] > latest[h]["n_duplicates"]:
            latest[h] = r

    by_first = {r["first_doc_id"]: r for r in latest.values()}
    assert by_first[1]["n_duplicates"] == 1  # doc 3 was a duplicate of doc 1
    assert by_first[2]["n_duplicates"] == 0
    assert by_first[4]["n_duplicates"] == 0
    assert 3 not in by_first  # doc 3 never became a canonical first-seen

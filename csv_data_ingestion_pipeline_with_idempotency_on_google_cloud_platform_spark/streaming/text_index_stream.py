"""Streaming retrieval-index maintenance: document ingest keeps the
materialized BM25 index (operators/text_index.py) continuously
queryable.

per micro-batch (foreachBatch is at-least-once, so every write is
keyed on batch_id, the neardup_stream pattern):
  1. first batch ever → build the index (batch_id-owned postings dir +
     derived sidecars);
  2. later batches → append the batch's postings into their own
     ``postings/batch_id=N`` directory with overwrite — a retried
     batch replaces its partial attempt, never duplicates — then
     rebuild the df/N/avgdl sidecars from the merged postings, so a
     probe issued after any committed batch scores EXACTLY like a
     corpus scan over everything ingested so far.

State lives in the index files, not executor memory: a restart
resumes from the checkpoint with the index already reflecting every
committed batch. The disjoint-batch contract is inherited from
`append_to_text_index` (route re-deliveries of the same DOCUMENT
through the idempotency gate / stateful dedup upstream; batch_id
idempotency covers re-deliveries of the same BATCH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _index_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    n_buckets: int,
) -> None:
    from pyspark.errors import AnalysisException

    from ..operators import text_index

    batch = batch.select("doc_id", "text")
    try:
        text_index.append_to_text_index(
            batch, index_dir, batch_id=int(batch_id)
        )
    except AnalysisException as ex:
        # ONLY the missing-index case may pass (first batch); any other
        # analysis error must fail the batch loudly (same reasoning as
        # neardup_stream._gate_batch)
        msg = str(ex)
        if "PATH_NOT_FOUND" not in msg and "UNABLE_TO_INFER_SCHEMA" not in msg:
            raise
        text_index._write_postings_batch(
            batch, index_dir, int(batch_id), n_buckets, "doc_id", "text"
        )
        text_index._write_sidecars(spark, index_dir, n_buckets)


def start_text_index_stream(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 64,
    max_files_per_trigger: int = 10,
):
    """Start streaming index maintenance over a JSON-lines document
    feed with fields (doc_id, text); returns the StreamingQuery."""
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(docs_dir)
    )
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda b, bid: _index_batch(spark, b, bid, index_dir, n_buckets)
        )
        .start()
    )

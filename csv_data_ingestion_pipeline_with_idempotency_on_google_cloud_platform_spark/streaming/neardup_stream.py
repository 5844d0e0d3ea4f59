"""Streaming near-dup gate: the incremental MinHash index in its
operational role.

`streaming/stateful_dedup.py` catches EXACT duplicates across
micro-batches with keyed state; this query catches NEAR duplicates by
pairing the streaming file source with the materialized band index
(operators/dedup_index.py):

per micro-batch (foreachBatch is at-least-once, so every write below
is made idempotent by keying it on batch_id):
  1. probe the batch against the index — batch band entries broadcast,
     index scanned, never shuffled;
  2. batch-internal near-dups via the one-shot self-join (the batch is
     small, so the self-join is too);
  3. commit surviving docs to clean_dir/batch_id=N and their band
     entries to index_dir/batch_id=N, each with overwrite — a retried
     batch replaces its own partial attempt instead of appending
     duplicates, so batch N+1 dedups against exactly what batch N kept.

State lives in the index files, not executor memory — a restart
resumes from the checkpoint with the index already reflecting every
committed batch (the same durability argument as the ledger: state is
a table, not a process).

Layout note: clean_dir and index_dir are hive-partitioned by batch_id
(readers see a `batch_id` column). Directories written by the
pre-batch_id flat layout must be migrated (one rewrite into
batch_id=0) before pointing this query at them — Spark refuses mixed
partition depths at read time, which the gate surfaces as an error
rather than silently skipping the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import minhash_lsh_candidates
from ..operators.dedup_index import (
    append_to_minhash_index,
    probe_minhash_index,
)


def _gate_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    clean_dir: str,
    min_est_jaccard: float,
) -> None:
    batch = batch.select("doc_id", "text")
    # FS-agnostic index detection: attempt the read instead of globbing
    # the driver's local filesystem (which silently reports "no index"
    # for any object-store path) — an unreadable/absent index and a
    # genuinely empty one both mean "nothing to probe yet"
    from pyspark.errors import AnalysisException

    drop = batch.sparkSession.createDataFrame([], "doc_id long")
    try:
        vs_corpus = probe_minhash_index(
            batch, index_dir, min_est_jaccard=min_est_jaccard
        )
        drop = drop.union(vs_corpus.select(F.col("id_new").alias("doc_id")))
    except AnalysisException as ex:
        # ONLY the missing-index case may pass (first batch): any other
        # analysis error (mixed partition layouts, corrupt footers)
        # must fail the batch loudly — swallowing it would silently
        # disable cross-batch dedup forever.
        msg = str(ex)
        if "PATH_NOT_FOUND" not in msg and "UNABLE_TO_INFER_SCHEMA" not in msg:
            raise
    # batch-internal: drop the higher id of each confident pair
    vs_batch = minhash_lsh_candidates(batch, min_est_jaccard=min_est_jaccard)
    drop = drop.union(vs_batch.select(F.col("id_b").alias("doc_id"))).distinct()

    kept = batch.join(F.broadcast(drop), "doc_id", "left_anti")
    # Idempotent commits: foreachBatch is at-least-once, so a batch
    # retried after a partial write must not duplicate output. Each
    # batch owns a batch_id=N directory written with overwrite — the
    # retry replaces its own previous partial attempt, and committed
    # batches are untouched. Readers see batch_id as a partition column.
    kept.write.mode("overwrite").parquet(f"{clean_dir}/batch_id={batch_id}")
    append_to_minhash_index(
        kept, f"{index_dir}/batch_id={batch_id}", mode="overwrite"
    )


def start_neardup_stream(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    clean_dir: str,
    checkpoint_dir: str,
    min_est_jaccard: float = 0.5,
    max_files_per_trigger: int = 10,
):
    """Start the streaming near-dup gate over a JSON-lines document
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
            lambda b, bid: _gate_batch(
                spark, b, bid, index_dir, clean_dir, min_est_jaccard
            )
        )
        .start()
    )

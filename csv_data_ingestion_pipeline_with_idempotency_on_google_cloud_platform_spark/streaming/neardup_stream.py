"""Streaming near-dup gate: the incremental MinHash index in its
operational role.

`streaming/stateful_dedup.py` catches EXACT duplicates across
micro-batches with keyed state; this query catches NEAR duplicates by
pairing the streaming file source with the materialized band index
(operators/dedup_index.py):

per micro-batch (foreachBatch = the transactional boundary):
  1. probe the batch against the index — batch band entries broadcast,
     index scanned, never shuffled;
  2. batch-internal near-dups via the one-shot self-join (the batch is
     small, so the self-join is too);
  3. append surviving docs to the clean output AND their band entries
     to the index, so batch N+1 dedups against everything batch N kept.

State lives in the index files, not executor memory — a restart
resumes from the checkpoint with the index already reflecting every
committed batch (the same durability argument as the ledger: state is
a table, not a process).
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
    index_dir: str,
    clean_dir: str,
    min_est_jaccard: float,
) -> None:
    import glob

    batch = batch.select("doc_id", "text")
    # an index exists once some batch has appended at least one band
    # partition (a zero-row append leaves only _SUCCESS behind, which
    # parquet schema inference would choke on)
    have_index = bool(glob.glob(f"{index_dir}/band_id=*"))

    drop = batch.sparkSession.createDataFrame([], "doc_id long")
    if have_index:
        vs_corpus = probe_minhash_index(
            batch, index_dir, min_est_jaccard=min_est_jaccard
        )
        drop = drop.union(vs_corpus.select(F.col("id_new").alias("doc_id")))
    # batch-internal: drop the higher id of each confident pair
    vs_batch = minhash_lsh_candidates(batch, min_est_jaccard=min_est_jaccard)
    drop = drop.union(vs_batch.select(F.col("id_b").alias("doc_id"))).distinct()

    kept = batch.join(F.broadcast(drop), "doc_id", "left_anti")
    kept.write.mode("append").parquet(clean_dir)
    append_to_minhash_index(kept, index_dir)


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
            lambda b, _id: _gate_batch(
                spark, b, index_dir, clean_dir, min_est_jaccard
            )
        )
        .start()
    )

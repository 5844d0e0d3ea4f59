"""Streaming benchmark-decontamination gate: cross_set_ngram_overlap
(operators/dedup.py) in its operational role — applied at ingest, so
contaminated training documents never land in the corpus at all.

The benchmark/eval side is STATIC for the life of the stream (eval
suites change by release, not by micro-batch), so its distinct gram set
is computed once at stream start and broadcast into every batch join —
the streaming side never shuffles, exactly like the batch operator's
100 TB shape.

foreachBatch is at-least-once, so each batch owns overwrite-mode
batch_id=N directories (clean + quarantine): a retried batch replaces
its own partial attempt, committed batches are untouched — the same
idempotent-commit scheme as the near-dup gate (neardup_stream.py).
Quarantined docs are routed WITH their evidence (matched eval doc and
shared-gram count), because a decontamination pipeline that silently
drops rows is unauditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import word_shingles_col


def _gate_batch(
    batch: DataFrame,
    batch_id: int,
    eval_grams: DataFrame,
    clean_dir: str,
    quarantine_dir: str,
    n: int,
    min_shared: int,
) -> None:
    batch = batch.select("doc_id", "text")
    grams = batch.select(
        F.col("doc_id"),
        F.explode(word_shingles_col("text", n)).alias("gram"),
    )
    hits = (
        grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    contaminated = (
        hits.filter(F.col("n_shared") >= min_shared)
        .groupBy("doc_id")
        .agg(
            F.max(F.struct("n_shared", "eval_id")).alias("top"),
        )
        .select(
            "doc_id",
            F.col("top.eval_id").alias("matched_eval_id"),
            F.col("top.n_shared").alias("n_shared"),
        )
        # tiny (one row per contaminated doc) but derived from the
        # expensive gram-explode + join + groupBy — persist so the
        # clean write and the quarantine write don't each recompute it
        .persist()
    )
    try:
        clean = batch.join(
            F.broadcast(contaminated.select("doc_id")), "doc_id", "left_anti"
        )
        quarantined = batch.join(contaminated, "doc_id")
        clean.write.mode("overwrite").parquet(f"{clean_dir}/batch_id={batch_id}")
        quarantined.write.mode("overwrite").parquet(
            f"{quarantine_dir}/batch_id={batch_id}"
        )
    finally:
        contaminated.unpersist()


def start_decontam_stream(
    spark: SparkSession,
    docs_dir: str,
    eval_set: DataFrame,
    clean_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    n: int = 5,
    min_shared: int = 1,
    max_files_per_trigger: int = 10,
):
    """Start the decontamination gate over a JSON-lines document feed
    with fields (doc_id, text); returns the StreamingQuery.

    `eval_set` is a batch DataFrame (doc_id, text) of benchmark
    documents; its distinct (gram, eval_id) set is derived once here.
    """
    eval_grams = (
        eval_set.select(
            F.col("doc_id").alias("eval_id"),
            F.explode(word_shingles_col("text", n)).alias("gram"),
        )
        # eval suites are small; cache so batches reuse the computed
        # gram set. persist() (NOT localCheckpoint) on purpose: the
        # lineage stays intact, so losing an executor's cached blocks
        # mid-stream recomputes them instead of permanently failing
        # every subsequent micro-batch — this frame lives for the whole
        # stream lifetime, unlike the intra-job checkpoints elsewhere.
        .persist()
    )
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
                b, bid, eval_grams, clean_dir, quarantine_dir, n, min_shared
            )
        )
        .start()
    )

"""Streaming quality gate: the linear classifier (operators/classify)
applied at ingest — the third member of the ingest-gate trio
(near-dup gate: neardup_stream; decontamination: decontam_stream).

The model is trained OFFLINE (train_token_weights + prior_milli over a
reference corpus) and handed to the stream as plain driver values — a
(term → weight) dict and a prior. Weights re-enter each micro-batch as
a broadcast-sized literal frame, so scoring is the batch operator's
exact shape: explode tokens → broadcast join → per-doc integer sum.
Model state lives on the driver (like k-means centroids), not in
executor caches, so executor loss costs nothing and a model refresh is
just restarting the stream with new weights.

Commit scheme: idempotent per-batch overwrite directories, identical
to the other gates. Rejected docs carry their score — an unauditable
quality filter is a silent corpus bias."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_col


def collect_model(weights: DataFrame, prior: DataFrame) -> tuple[list, int]:
    """Materialize a trained model to driver values: ≤vocab_size
    (term, weight_milli) rows + the scalar prior.

    Size guard: the weight table is bounded by the trainer's vocab cap
    (classify.py trains on a top-V TakeOrdered vocabulary), so this
    collect is O(vocab) — tens of thousands of small rows, the same
    bounded-driver-state class as k-means centroids. If a caller ever
    feeds an uncapped weight table, cap it upstream; do NOT lift this
    into per-batch joins — the broadcast-once-per-stream shape is the
    point."""
    w = [
        (r["term"], r["weight_milli"])
        for r in weights.select("term", "weight_milli").collect()
    ]
    p = prior.collect()[0]["prior_milli"]
    return w, int(p)


def _score_batch(
    batch: DataFrame,
    weights_rows: list,
    prior: int,
    min_score_milli: int,
    kept_dir: str,
    rejected_dir: str,
    batch_id: int,
) -> None:
    spark = batch.sparkSession
    batch = batch.select("doc_id", "text")
    wdf = spark.createDataFrame(weights_rows, "term string, weight_milli long")
    toks = batch.select(
        "doc_id", F.explode(tokens_col("text")).alias("tok")
    ).select("doc_id", F.lower("tok").alias("term"))
    scores = (
        toks.join(F.broadcast(wdf), "term")
        .groupBy("doc_id")
        .agg(F.sum("weight_milli").alias("tok_score"))
    )
    scored = (
        batch.join(scores, "doc_id", "left")
        .select(
            "doc_id",
            "text",
            (F.lit(prior) + F.coalesce(F.col("tok_score"), F.lit(0)))
            .cast("bigint")
            .alias("score_milli"),
        )
        .persist()
    )
    try:
        kept = scored.filter(F.col("score_milli") >= min_score_milli)
        rejected = scored.filter(F.col("score_milli") < min_score_milli)
        kept.write.mode("overwrite").parquet(f"{kept_dir}/batch_id={batch_id}")
        rejected.write.mode("overwrite").parquet(
            f"{rejected_dir}/batch_id={batch_id}"
        )
    finally:
        scored.unpersist()


def start_quality_stream(
    spark: SparkSession,
    docs_dir: str,
    weights: DataFrame,
    prior: DataFrame,
    kept_dir: str,
    rejected_dir: str,
    checkpoint_dir: str,
    min_score_milli: int = 0,
    max_files_per_trigger: int = 10,
):
    """Start the quality gate over a JSON-lines document feed with
    fields (doc_id, text); returns the StreamingQuery. `weights` /
    `prior` are the offline-trained model frames
    (classify.train_token_weights / classify.prior_milli)."""
    weights_rows, prior_val = collect_model(weights, prior)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(docs_dir)
    )
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda b, bid: _score_batch(
                b,
                weights_rows,
                prior_val,
                min_score_milli,
                kept_dir,
                rejected_dir,
                bid,
            )
        )
        .start()
    )

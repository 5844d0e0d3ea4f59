"""Dead-letter routing — operator E2 (SURVEY.md §2a).

Reference: a failing file is nacked and redelivered with exponential
backoff; after 5 attempts Pub/Sub moves the message to the DLQ topic
(``ARCHITECTURE.md:73-79,119-132``), while the ledger records `failed`
with an error message (``main.py:146-152``).

Spark-first: failures are *data*. Each failed processing attempt is a
`failed` transition row; DLQ membership is a plain aggregation —
attempts per upload — with `attempt >= MAX_DELIVERY_ATTEMPTS` terminal.
No queue infrastructure: one `groupBy` (map-side partial counts, so the
shuffle carries one row per failing upload, not per attempt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import MAX_DELIVERY_ATTEMPTS


def route_to_dlq(
    transitions: DataFrame,
    max_attempts: int = MAX_DELIVERY_ATTEMPTS,
    key: str = "upload_id",
) -> DataFrame:
    """Aggregate failed transitions into DLQ records.

    Returns one row per upload that has at least one failed attempt:
    (key, attempt, last_error, last_failed_at, terminal) where
    terminal = attempt >= max_attempts — those uploads stop retrying.
    """
    failed = transitions.filter(F.col("status") == "failed")
    return failed.groupBy(key).agg(
        F.count("*").cast("int").alias("attempt"),
        F.max_by("error_message", "ts").alias("last_error"),
        F.max("ts").alias("last_failed_at"),
    ).withColumn("terminal", F.col("attempt") >= F.lit(max_attempts))


def dlq_replay(
    transitions: DataFrame,
    max_attempts: int = MAX_DELIVERY_ATTEMPTS,
    key: str = "upload_id",
) -> DataFrame:
    """Operational replay view: the FULL failed-attempt history of every
    terminal (DLQ'd) upload — what an operator inspects before deciding
    to requeue a poison file (the reference offers only the DLQ topic's
    opaque message backlog, ``ARCHITECTURE.md:119-132``).

    One row per failed attempt of each upload with >= max_attempts
    failures: (key, attempt, error_message, failed_at), attempt numbered
    in ts order. Single shuffle: the attempt number and the per-upload
    failure count come from the same window partitioning over `key`.
    """
    failed = transitions.filter(F.col("status") == "failed")
    wk = Window.partitionBy(key)
    w = wk.orderBy("ts", "error_message")
    return (
        failed.withColumn("attempt", F.row_number().over(w).cast("int"))
        .withColumn("__n", F.count("*").over(wk))
        .filter(F.col("__n") >= max_attempts)
        .select(
            key,
            "attempt",
            "error_message",
            F.col("ts").alias("failed_at"),
        )
    )

"""Streaming event-time analytics — extension X6, streaming side.

The batch windowed aggregations in operators/windows.py reuse the exact
same `F.window` expressions here; the only streaming additions are the
watermark (bounded state, late-data tolerance) and the output mode.

At scale: state store size is bounded by (watermark horizon ×
active keys); the shuffle key is (window, event_type) so state lookups
are co-located with the aggregation tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type.

    Events later than `watermark` behind the max seen event time are
    dropped and their windows finalized — the streaming twin of
    operators.windows.tumbling_window_agg.
    """
    # watermarks require zoned TIMESTAMP event time; batch tables carry
    # naive (NTZ) timestamps, so cast at the streaming boundary (session
    # timezone pins the interpretation)
    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_events_within_watermark(
    events_stream: DataFrame,
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """At-least-once → effectively-once for an event stream with the
    BUILT-IN bounded-state dedup: emit each key's first arrival and
    drop re-deliveries that land within the watermark horizon.

    Contrast with stateful_dedup (applyInPandasWithState, unbounded
    custom state): here Spark owns the state schema AND its eviction —
    a key older than the watermark is forgotten, so state is bounded by
    (arrival rate × horizon) regardless of stream lifetime. That is the
    right trade for transport-level duplicates (retries arrive within
    minutes), while content-level dedup wants the unbounded custom
    state. Output rows are the surviving events, unchanged.
    """
    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def interval_join_attribution(
    clicks_stream: DataFrame,
    purchases_stream: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every
    click by the same user within `horizon` before it.

    Both sides carry a watermark, so the join state each side buffers is
    bounded: a click can be dropped from state once the purchase-side
    watermark passes (click_ts + horizon), a purchase once it has seen
    all clicks at or before its timestamp. Without the time-range bound
    the state store would grow forever — the range condition is what
    makes stream-stream joins feasible at scale, and Spark derives the
    state eviction policy from it automatically.

    The batch twin (same predicate, same output) is
    operators.temporal.interval_join_batch; parity is pinned in
    tests/test_event_stream.py.
    """
    c = clicks_stream.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").cast("timestamp").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases_stream.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").cast("timestamp").alias("purchase_ts"),
        "value",
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        F.expr(
            f"""
            user_id = c_user_id
            AND click_ts <= purchase_ts
            AND click_ts >= purchase_ts - INTERVAL {horizon}
            """
        ),
        "inner",
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts", "value")


def sessionized_event_counts(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked per-user session windows — the streaming twin of
    operators.windows.session_window_agg. Session state merges as
    events arrive (windows grow/merge until the watermark closes them);
    state size is bounded by (watermark horizon × active users)."""
    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )

"""Event-time analytics over the `events` table — extension X6.

Tumbling windows via `F.window` (the same expression drives the
Structured Streaming path with `withWatermark`; see streaming/). Sums
are computed in DECIMAL so the result is exact and engine-independent,
then cast back to double for a stable comparison surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Per (hour-window, event_type): event count and exact value sum."""
    return (
        events.groupBy(
            F.window("ts", duration).alias("w"),
            "event_type",
        )
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


def sliding_window_agg(events: DataFrame, duration: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Sliding windows — each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", exact_micros: bool = False
) -> DataFrame:
    """Per-user session windows (gap-based); batch equivalent of the
    streaming session_window operator.

    ``exact_micros=True`` emits the value sum as integer micro-units
    (decimal-summed, ×1e6) instead of a double — Spark's decimal→double
    conversion is not always correctly rounded (observed one-ulp-low vs
    DuckDB on e.g. 83.180000), so the oracle-compared surface stays in
    exact integer space.
    """
    sum_val = (
        (F.sum(F.col("value").cast("decimal(18,6)")) * 1000000)
        .cast("long")
        .alias("sum_value_micros")
        if exact_micros
        else F.sum("value").alias("sum_value")
    )
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), sum_val)
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            F.col("sum_value_micros" if exact_micros else "sum_value"),
        )
    )

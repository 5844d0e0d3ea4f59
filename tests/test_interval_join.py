"""Stream-stream interval join (click→purchase attribution):

1. the streaming form must produce exactly the batch twin's pairs once
   all input is processed (watermarks only bound state, they must not
   drop anything when the full data fits the horizon), and
2. the batch twin must match the brute-force predicate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
    interval_join_batch,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming import (
    interval_join_attribution,
)

from .conftest import SF_DIR


def _split(ev):
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return clicks, purchases


def test_batch_interval_join_matches_bruteforce(spark):
    ev = load_table(spark, SF_DIR, "events")
    clicks, purchases = _split(ev)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in interval_join_batch(clicks, purchases, horizon="1 hour").collect()
    }

    c = [(r["event_id"], r["user_id"], r["ts"]) for r in clicks.collect()]
    expected = set()
    for r in purchases.collect():
        for cid, cu, cts in c:
            if cu == r["user_id"] and cts <= r["ts"] and (
                (r["ts"] - cts).total_seconds() <= 3600
            ):
                expected.add((r["event_id"], cid))
    assert got == expected
    assert expected  # non-vacuous: the fixture must contain attributed pairs


def test_streaming_interval_join_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    clicks, purchases = _split(ev)

    # Arrival order must respect event time to within the watermark
    # (the contract of any watermarked stream). The file source orders
    # by modification time, and a single parallel write can finish its
    # last time-range file first — so write one time slice at a time,
    # sequentially, to guarantee replay order.
    csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cuts = (
        clicks.select("ts").unionByName(purchases.select("ts"))
        .select(us.cast("double").alias("t"))
        .approxQuantile("t", [1 / 3, 2 / 3], 0.0)
    )
    import time

    bounds = [float("-inf"), *cuts, float("inf")]
    for lo, hi in zip(bounds, bounds[1:]):
        pred = (us.cast("double") > lo) & (us.cast("double") <= hi)
        clicks.filter(pred).coalesce(1).write.mode("append").parquet(csrc)
        purchases.filter(pred).coalesce(1).write.mode("append").parquet(psrc)
        time.sleep(1.1)  # distinct mtimes: the source sorts files by mod time

    cstream = (
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(csrc)
    )
    pstream = (
        spark.readStream.schema(purchases.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(psrc)
    )
    joined = interval_join_attribution(cstream, pstream, horizon="1 hour")

    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["purchase_id"], r["click_id"])
            for r in spark.sql("select purchase_id, click_id from attrib").collect()
        }
    finally:
        q.stop()

    expected = {
        (r["purchase_id"], r["click_id"])
        for r in interval_join_batch(clicks, purchases, horizon="1 hour").collect()
    }
    assert got == expected

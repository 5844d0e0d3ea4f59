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
    # (the contract of any watermarked stream); range-partition by ts so
    # file k holds earlier events than file k+1 — the file source lists
    # part files lexicographically, replaying the history in order.
    csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks.repartitionByRange(3, "ts").sortWithinPartitions("ts").write.parquet(csrc)
    purchases.repartitionByRange(3, "ts").sortWithinPartitions("ts").write.parquet(psrc)

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

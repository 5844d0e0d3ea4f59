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


def test_streaming_interval_join_evicts_click_state_past_watermark(spark, tmp_path):
    """The state-eviction contract: advancing the watermark past
    (click_ts + horizon) must remove rows from the join state store —
    that bounded-state guarantee is what makes the stream-stream join
    feasible, and it is observable in the stateOperators progress
    metrics. (Exact drop timing of late pairs is implementation
    detail: a late pair can still join batch-locally or against
    not-yet-swept state, so we assert eviction, not output absence.)"""
    from datetime import datetime
    import time

    BASE = datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return datetime(2024, 1, 1, 12, 0, 0).replace(
            hour=12 + minutes // 60, minute=minutes % 60
        )

    csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    cschema = "event_id long, user_id long, ts timestamp"
    pschema = "event_id long, user_id long, ts timestamp, value double"

    # trigger 1: the on-time pair for user 1, and the user-2 click at
    # t=+5min whose purchase will arrive two triggers later
    spark.createDataFrame(
        [(1, 1, BASE), (2, 2, ts(5))], cschema
    ).coalesce(1).write.mode("append").parquet(csrc)
    spark.createDataFrame(
        [(1001, 1, BASE, 1.0)], pschema
    ).coalesce(1).write.mode("append").parquet(psrc)
    time.sleep(1.1)

    # trigger 2: far-future events on both sides advance both
    # watermarks to +4h (2h delay), far past click_ts + 1h horizon —
    # the user-2 click's state is evicted at this batch boundary
    far = 360
    spark.createDataFrame([(99, 9, ts(far))], cschema).coalesce(1).write.mode(
        "append"
    ).parquet(csrc)
    spark.createDataFrame([(1999, 9, ts(far), 9.0)], pschema).coalesce(1).write.mode(
        "append"
    ).parquet(psrc)
    time.sleep(1.1)

    # trigger 3: the user-2 purchase at t=+10min — its click is gone
    spark.createDataFrame([(98, 9, ts(far + 1))], cschema).coalesce(1).write.mode(
        "append"
    ).parquet(csrc)
    spark.createDataFrame([(1002, 2, ts(10), 2.0)], pschema).coalesce(1).write.mode(
        "append"
    ).parquet(psrc)

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming import (
        interval_join_attribution,
    )

    cstream = (
        spark.readStream.schema(cschema).option("maxFilesPerTrigger", "1").parquet(csrc)
    )
    pstream = (
        spark.readStream.schema(pschema).option("maxFilesPerTrigger", "1").parquet(psrc)
    )
    joined = interval_join_attribution(cstream, pstream, horizon="1 hour", watermark="2 hours")
    q = (
        joined.writeStream.format("memory")
        .queryName("lateattrib")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["purchase_id"], r["click_id"])
            for r in spark.sql("select purchase_id, click_id from lateattrib").collect()
        }
        removed = sum(
            op.get("numRowsRemoved", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
        state_rows = max(
            (
                op.get("numRowsTotal", 0)
                for p in q.recentProgress[-1:]
                for op in p.get("stateOperators", [])
            ),
            default=0,
        )
    finally:
        q.stop()

    assert (1001, 1) in got  # the on-time pair joins
    # eviction happened: rows left the state store once the watermark
    # passed them, and the final state holds only the recent horizon
    assert removed > 0, [p.get("stateOperators") for p in q.recentProgress]
    assert state_rows < 8


def test_multi_touch_attribution_models(spark):
    """Planted touch counts: position model gives 40/20/40 (n=1 → 1,
    n=2 → .5/.5, n=4 → .4/.1/.1/.4), linear gives 1/n; credit always
    sums to 1 per purchase."""
    import datetime as dt

    from pyspark.sql import Row

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        multi_touch_attribution,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, minutes):
        return Row(event_id=eid, user_id=uid, ts=t0 + dt.timedelta(minutes=minutes))

    # user 1: one touch; user 2: two; user 3: four
    clicks = spark.createDataFrame(
        [ev(10, 1, 0)]
        + [ev(20 + i, 2, i) for i in range(2)]
        + [ev(30 + i, 3, i) for i in range(4)]
    )
    purchases = spark.createDataFrame(
        [
            Row(event_id=100, user_id=1, ts=t0 + dt.timedelta(minutes=30), value=10.0),
            Row(event_id=200, user_id=2, ts=t0 + dt.timedelta(minutes=30), value=20.0),
            Row(event_id=300, user_id=3, ts=t0 + dt.timedelta(minutes=30), value=40.0),
        ]
    )
    pos = multi_touch_attribution(clicks, purchases, model="position").collect()
    by_touch = {(r["purchase_id"], r["touch_rank"]): r for r in pos}
    assert by_touch[(100, 1)]["credit"] == 1.0
    assert by_touch[(200, 1)]["credit"] == 0.5
    assert [by_touch[(300, i)]["credit"] for i in (1, 2, 3, 4)] == [0.4, 0.1, 0.1, 0.4]
    assert by_touch[(300, 1)]["credited_value"] == 16.0

    lin = multi_touch_attribution(clicks, purchases, model="linear").collect()
    for r in lin:
        assert abs(r["credit"] - round(1.0 / r["n_touches"], 6)) < 1e-9

    import pytest as _pytest

    with _pytest.raises(ValueError):
        multi_touch_attribution(clicks, purchases, model="bogus")

"""Streaming Holt + changepoint monitors: cross-batch state must
reproduce the batch operators exactly on the same closed daily series
(batch-parity), and must survive a checkpoint stop/restart — the CUSUM
twin's test discipline applied to the forecasting family."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming import (
    streaming_changepoint_monitor,
    streaming_holt_monitor,
)

SCHEMA = "group string, day string, y long"


def _df(spark, rows):
    # one part file per write: the holt monitor's contract is a
    # monotone closed-day feed, so a test batch must not be split into
    # unordered per-file triggers
    return spark.createDataFrame(rows, SCHEMA).coalesce(1)


def _events_df(spark, rows):
    """The same series as raw events for the BATCH operators: one event
    per (group, day, y) row with value == y (whole units)."""
    return spark.createDataFrame(
        [
            (i, g, f"{d} 12:00:00", float(y))
            for i, (g, d, y) in enumerate(rows)
        ],
        "event_id long, event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))


# a level shift at day 10 plus slope — interesting for both monitors
DAYS = [f"2024-01-{d:02d}" for d in range(1, 21)]
SERIES = [("t", DAYS[i], 100 + 3 * i + (200 if i >= 10 else 0)) for i in range(20)]


def test_streaming_holt_matches_batch_fold(spark, tmp_path):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        holt_winters_forecast,
    )

    src = tmp_path / "daily"
    src.mkdir()
    _df(spark, SERIES[:8]).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_holt_monitor(stream)
        .writeStream.format("memory")
        .queryName("holt_live")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # replayed + out-of-order days must be skipped, not re-folded
        _df(spark, SERIES[2:20]).write.mode("append").parquet(str(src / "b2"))
        q.processAllAvailable()
        rows = spark.sql("select * from holt_live").collect()
    finally:
        q.stop()

    last = max(rows, key=lambda r: r["n_days"])
    assert last["n_days"] == 20
    batch = {
        r["h"]: r["forecast_milli"]
        for r in holt_winters_forecast(_events_df(spark, SERIES)).collect()
    }
    for h in (1, 7):
        assert last["level_milli"] + h * last["trend_milli"] == batch[h]
    assert last["forecast_next_milli"] == batch[1]


def test_streaming_changepoint_matches_batch(spark, tmp_path):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        changepoint_detect,
    )

    src = tmp_path / "daily"
    src.mkdir()
    # day totals split across rows AND batches within the first 10
    # days: the monitor must SUM them (the batch groupBy semantics).
    # Only the final batch reaches n_days=20, so the fullest emission
    # is unambiguous in the memory sink.
    b1 = [(g, d, y // 2) for g, d, y in SERIES[:10]]
    b2 = [(g, d, y - y // 2) for g, d, y in SERIES[:10]] + SERIES[10:]
    _df(spark, b1).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_changepoint_monitor(stream)
        .writeStream.format("memory")
        .queryName("cp_live")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _df(spark, b2).write.mode("append").parquet(str(src / "b2"))
        q.processAllAvailable()
        rows = spark.sql("select * from cp_live").collect()
    finally:
        q.stop()

    last = max(rows, key=lambda r: r["n_days"])
    b = changepoint_detect(_events_df(spark, SERIES)).collect()[0]
    assert last["n_days"] == b["n_days"] == 20
    # planted +200 shift after index 9 -> split at day 10
    assert last["split_day"] == b["split_day"] == DAYS[9]
    assert abs(last["sse_reduction_milli"] - b["sse_reduction_milli"]) < 1e-9


def test_forecast_monitors_survive_restart(spark, tmp_path):
    src = tmp_path / "daily"
    src.mkdir()
    out = str(tmp_path / "out")
    _df(spark, SERIES[:10]).write.parquet(str(src / "b1"))

    def _run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        return (
            streaming_holt_monitor(stream)
            .writeStream.foreachBatch(
                lambda df, bid: df.withColumn("bid", F.lit(bid))
                .write.mode("append")
                .parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    q = _run()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _df(spark, SERIES[10:]).write.mode("append").parquet(str(src / "b2"))
    q2 = _run()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    final = spark.read.parquet(out).orderBy(F.desc("bid")).collect()[0]
    assert final["n_days"] == 20

    # one uninterrupted run over the same days must land on the same fold
    src2 = tmp_path / "daily2"
    src2.mkdir()
    _df(spark, SERIES).write.parquet(str(src2 / "b1"))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src2 / "*"))
    q3 = (
        streaming_holt_monitor(stream)
        .writeStream.format("memory")
        .queryName("holt_oneshot")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    try:
        q3.processAllAvailable()
        oneshot = spark.sql("select * from holt_oneshot").collect()[0]
    finally:
        q3.stop()
    assert (final["level_milli"], final["trend_milli"]) == (
        oneshot["level_milli"],
        oneshot["trend_milli"],
    )

"""Streaming CUSUM monitor: cross-batch state must accumulate the
running deviation exactly (integer milli arithmetic), the high-water
mark must survive a level shift split across micro-batches, and the
alarm must latch once crossed."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming import (
    streaming_cusum_monitor,
    train_targets,
)

SCHEMA = "event_id long, event_type string, value double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_streaming_cusum_detects_cross_batch_shift(spark, tmp_path):
    # reference window: level 100 -> target 100_000 milli
    ref = _df(spark, [(i, "t", 100.0) for i in range(10)])
    targets = train_targets(ref)
    assert targets == {"t": 100_000}

    src = tmp_path / "events"
    src.mkdir()
    # batch 1: on-target (cusum stays 0); batch 2: shifted +50 per event
    _df(spark, [(i, "t", 100.0) for i in range(5)]).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_cusum_monitor(stream, targets, alarm_milli=120_000)
        .writeStream.format("memory")
        .queryName("cusum_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.sql(
            "select * from cusum_state order by n_seen desc limit 1"
        ).collect()[0]
        assert first["n_seen"] == 5
        assert first["cusum_milli"] == 0 and first["alarm"] is False

        _df(spark, [(10 + i, "t", 150.0) for i in range(4)]).write.mode(
            "append"
        ).parquet(str(src / "b2"))
        q.processAllAvailable()
        rows = spark.sql("select * from cusum_state").collect()
    finally:
        q.stop()

    last = max(rows, key=lambda r: r["n_seen"])
    # 4 events at +50 -> cusum 4*50_000 = 200_000 milli, alarm latched
    assert last["n_seen"] == 9
    assert last["cusum_milli"] == 200_000
    assert last["max_abs_cusum_milli"] == 200_000
    assert last["alarm"] is True


def test_streaming_cusum_skips_untrained_groups(spark, tmp_path):
    targets = {"known": 100_000}
    src = tmp_path / "events2"
    src.mkdir()
    _df(
        spark,
        [(1, "known", 100.0), (2, "mystery", 9.0), (3, "mystery", 9.0)],
    ).write.parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "100")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_cusum_monitor(stream, targets, alarm_milli=1)
        .writeStream.format("memory")
        .queryName("cusum_state2")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from cusum_state2").collect()
    finally:
        q.stop()
    assert {r["group"] for r in rows} == {"known"}

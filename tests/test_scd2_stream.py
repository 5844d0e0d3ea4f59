"""Streaming SCD2 twin: cross-batch interval maintenance must converge
to the batch operator's result when events arrive in event-time order."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.cdc import (
    scd2_build,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming import (
    streaming_scd2,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _df(spark, rows):
    return spark.createDataFrame(
        [(e, t, u, a) for e, t, u, a in rows], 
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_streaming_scd2_converges_to_batch(spark, tmp_path):
    b1 = [
        (1, "2024-01-01 00:00:00", 7, "A"),
        (2, "2024-01-02 00:00:00", 7, "A"),   # duplicate: extends
        (3, "2024-01-03 00:00:00", 7, "B"),   # closes A, opens B
        (4, "2024-01-01 00:00:00", 8, "X"),
    ]
    b2 = [
        (5, "2024-01-04 00:00:00", 7, "A"),   # cross-batch: closes B
        (6, "2024-01-02 00:00:00", 8, "X"),   # extends silently
    ]
    src = tmp_path / "events"
    src.mkdir()
    _df(spark, b1).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "100")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_scd2(stream)
        .writeStream.format("memory")
        .queryName("scd2_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _df(spark, b2).write.mode("append").parquet(str(src / "b2"))
        q.processAllAvailable()
        rows = spark.sql("select * from scd2_state").collect()
    finally:
        q.stop()

    # closed rows are immutable facts; the open row per user is the
    # LAST update emitted (latest-wins on (user, valid_from))
    closed = {(r["user_id"], r["event_type"], r["valid_from_us"]): r["valid_to_us"]
              for r in rows if not r["is_current"]}
    open_rows = {}
    for r in rows:
        if r["is_current"]:
            open_rows[r["user_id"]] = max(
                open_rows.get(r["user_id"], 0), r["valid_from_us"]
            )

    batch = scd2_build(_df(spark, b1 + b2)).collect()
    batch_closed = {
        (r["user_id"], r["event_type"],
         int(r["valid_from"].timestamp() * 1_000_000)):
            int(r["valid_to"].timestamp() * 1_000_000)
        for r in batch if not r["is_current"]
    }
    batch_open = {
        r["user_id"]: int(r["valid_from"].timestamp() * 1_000_000)
        for r in batch if r["is_current"]
    }
    assert closed == batch_closed
    assert open_rows == batch_open


def test_streaming_scd2_silent_extension_emits_nothing(spark, tmp_path):
    """A batch containing only same-attribute changes for a key whose
    state already holds that attribute emits no rows for it."""
    src = tmp_path / "events"
    src.mkdir()
    _df(spark, [(1, "2024-01-01 00:00:00", 1, "A")]).write.parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "100")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_scd2(stream)
        .writeStream.format("memory")
        .queryName("scd2_silent")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("select count(*) c from scd2_silent").collect()[0]["c"]
        _df(spark, [(2, "2024-01-02 00:00:00", 1, "A")]).write.mode("append").parquet(
            str(src / "b2")
        )
        q.processAllAvailable()
        n2 = spark.sql("select count(*) c from scd2_silent").collect()[0]["c"]
    finally:
        q.stop()
    assert n1 == 1  # the initial open interval
    assert n2 == n1  # duplicate extension emitted nothing new

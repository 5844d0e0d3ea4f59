"""Streaming engagement twin (X87): the per-user sliding day-set dedup
must emit each user-day exactly once across micro-batches, survive a
checkpoint restart without re-emitting, and its ledger readout must
equal the batch active_user_rollup bit-for-bit."""

from __future__ import annotations

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
    active_user_rollup,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.engagement_stream import (
    engagement_rollup_from_ledger,
    streaming_user_days,
)

SCHEMA = "event_id long, user_id long, ts string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).selectExpr(
        "event_id", "user_id", "cast(ts as timestamp) as ts"
    )


def _start(spark, src, ckpt, name):
    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    return (
        streaming_user_days(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )


def test_streaming_user_days_batch_parity(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    b1 = [
        (0, 1, "2024-01-01 08:00:00"),
        (1, 1, "2024-01-01 21:00:00"),  # same user-day -> one emission
        (2, 2, "2024-01-01 09:00:00"),
        (3, 1, "2024-01-03 10:00:00"),
    ]
    b2 = [
        (4, 1, "2024-01-01 23:00:00"),  # duplicate user-day across batches
        (5, 2, "2024-01-05 11:00:00"),
        (6, 3, "2024-01-06 12:00:00"),
    ]
    _df(spark, b1).write.parquet(str(src / "b1"))
    q = _start(spark, src, tmp_path / "ckpt", "ud1")
    try:
        q.processAllAvailable()
        _df(spark, b2).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        emitted = [
            (r["user_id"], r["d"]) for r in spark.sql("select * from ud1").collect()
        ]
    finally:
        q.stop()
    # exactly once per distinct user-day
    assert len(emitted) == len(set(emitted)) == 5

    ledger = spark.createDataFrame(emitted, "user_id long, d long")
    got = {
        r["day"]: (r["dau"], r["wau"], r["mau"])
        for r in engagement_rollup_from_ledger(ledger).collect()
    }
    want = {
        r["day"]: (r["dau"], r["wau"], r["mau"])
        for r in active_user_rollup(_df(spark, b1 + b2)).collect()
    }
    assert got == want


def test_streaming_user_days_checkpoint_restart(spark, tmp_path):
    """Restart from the checkpoint must keep the per-user day-set state:
    a replayed user-day emits nothing, a new day emits once — the
    ledger (the natural parquet sink of this stream) stays duplicate-
    free across the restart."""
    src = tmp_path / "events"
    src.mkdir()
    ledger = str(tmp_path / "ledger")

    def _run():
        stream = (
            spark.readStream.schema("event_id long, user_id long, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        return (
            streaming_user_days(stream)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(ledger)
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    _df(spark, [(0, 7, "2024-02-01 10:00:00")]).write.parquet(str(src / "b1"))
    q = _run()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # restart; feed a duplicate user-day + a genuinely new day
    _df(
        spark,
        [(1, 7, "2024-02-01 20:00:00"), (2, 7, "2024-02-02 09:00:00")],
    ).write.parquet(str(src / "b2"))
    q2 = _run()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows = sorted(
        (r["user_id"], r["d"]) for r in spark.read.parquet(ledger).collect()
    )
    assert rows == [(7, 19754), (7, 19755)]  # 2024-02-01, 2024-02-02 once each


def test_streaming_user_days_horizon_reemission_absorbed(spark, tmp_path):
    """A user-day older than retention re-emits (state aged out), but
    the ledger readout's distinct() keeps results exact."""
    src = tmp_path / "events"
    src.mkdir()
    early = [(0, 1, "2024-01-01 10:00:00")]
    late_gap = [(1, 1, "2024-03-15 10:00:00")]  # >30d later: ages out day 1
    replay = [(2, 1, "2024-01-01 12:00:00")]  # same user-day as `early`
    _df(spark, early).write.parquet(str(src / "b1"))
    q = _start(spark, src, tmp_path / "ckpt", "ud3")
    try:
        q.processAllAvailable()
        _df(spark, late_gap).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        _df(spark, replay).write.parquet(str(src / "b3"))
        q.processAllAvailable()
        emitted = [
            (r["user_id"], r["d"]) for r in spark.sql("select * from ud3").collect()
        ]
    finally:
        q.stop()
    # the replayed beyond-horizon day IS re-emitted...
    assert len(emitted) == 3 and len(set(emitted)) == 2
    # ...and the readout still matches batch exactly
    ledger = spark.createDataFrame(emitted, "user_id long, d long")
    got = {
        r["day"]: (r["dau"], r["wau"], r["mau"])
        for r in engagement_rollup_from_ledger(ledger).collect()
    }
    want = {
        r["day"]: (r["dau"], r["wau"], r["mau"])
        for r in active_user_rollup(_df(spark, early + late_gap + replay)).collect()
    }
    assert got == want

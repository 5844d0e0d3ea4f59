"""Streaming experiment guardrails (X89/X119 twins): the SRM delta
ledger must reproduce batch srm_check bit-for-bit, the binned-W1
monitor must match its batch twin and keep exact histogram state
across micro-batches, alarms must latch, and both must survive a
checkpoint restart."""

from __future__ import annotations

import hashlib

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
    srm_check,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.guardrail_stream import (
    binned_w1,
    srm_from_ledger,
    streaming_binned_w1_monitor,
    streaming_unit_deltas,
    train_value_bins,
)

SCHEMA = "event_id long, user_id long, event_type string, value double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _arm_a(uid: int) -> bool:
    return hashlib.md5(str(uid).encode()).hexdigest()[0] < "8"


def test_srm_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    b1 = [(i, i % 20, "t1", 1.0) for i in range(40)]
    b2 = [(100 + i, i % 35, "t1", 1.0) for i in range(70)] + [
        (200 + i, i, "t2", 2.0) for i in range(10)
    ]
    _df(spark, b1).write.parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_unit_deltas(stream)
        .writeStream.format("memory")
        .queryName("srm_ledger")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _df(spark, b2).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        ledger = spark.sql("select * from srm_ledger")
        emitted = [(r["t"], r["u"]) for r in ledger.collect()]
    finally:
        q.stop()
    # exactly one delta per distinct (type, unit)
    assert len(emitted) == len(set(emitted))

    got = {
        r["event_type"]: (r["users_a"], r["users_b"], r["chi2"], r["srm_flag"])
        for r in srm_from_ledger(spark.createDataFrame(emitted, "t string, u string")).collect()
    }
    want = {
        r["event_type"]: (r["users_a"], r["users_b"], r["chi2"], r["srm_flag"])
        for r in srm_check(_df(spark, b1 + b2)).collect()
    }
    assert got == want


def test_binned_w1_stream_matches_batch_twin(spark, tmp_path):
    # reference window: t1 values 1..100 -> quantile edges
    ref = _df(spark, [(i, i, "t1", float(i % 100 + 1)) for i in range(400)])
    bins = train_value_bins(ref, n_bins=8)
    assert "t1" in bins and len(bins["t1"]) >= 2

    src = tmp_path / "events"
    src.mkdir()
    b1 = [(i, i, "t1", float(i % 50 + 1)) for i in range(60)]
    b2 = [(100 + i, i, "t1", float(i % 90 + 10)) for i in range(80)]
    _df(spark, b1).write.parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_binned_w1_monitor(stream, bins, alarm_w1_milli=1e12)
        .writeStream.format("memory")
        .queryName("w1_mon")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _df(spark, b2).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        rows = spark.sql("select * from w1_mon").collect()
    finally:
        q.stop()
    last = max(rows, key=lambda r: r["n_a"] + r["n_b"])
    want = binned_w1(_df(spark, b1 + b2), bins)["t1"]
    assert (last["n_a"], last["n_b"], last["w1_milli"]) == want
    assert last["alarm"] is False


def test_binned_w1_alarm_latches(spark, tmp_path):
    ref = _df(spark, [(i, i, "t1", float(i % 10 + 1)) for i in range(100)])
    bins = train_value_bins(ref, n_bins=4)
    src = tmp_path / "events"
    src.mkdir()
    # batch 1: arms wildly different (a: tiny values, b: huge) -> alarm
    b1 = [
        (i, uid, "t1", 1.0 if _arm_a(uid) else 9999.0)
        for i, uid in enumerate(range(40))
    ]
    # batch 2: balanced data that walks W1 back down -> alarm must stay
    b2 = [(100 + i, 1000 + i, "t1", 5.0) for i in range(400)]
    _df(spark, b1).write.parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_binned_w1_monitor(stream, bins, alarm_w1_milli=100.0)
        .writeStream.format("memory")
        .queryName("w1_latch")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.sql("select * from w1_latch").collect()
        assert any(r["alarm"] for r in first), "alarm should fire on batch 1"
        _df(spark, b2).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        rows = spark.sql("select * from w1_latch").collect()
    finally:
        q.stop()
    last = max(rows, key=lambda r: r["n_a"] + r["n_b"])
    assert last["alarm"] is True  # latched despite the walk-back


def test_guardrail_checkpoint_restart(spark, tmp_path):
    """Restarting both monitors from their checkpoints must keep state:
    the SRM ledger stays duplicate-free and the W1 histograms keep
    accumulating instead of resetting."""
    src = tmp_path / "events"
    src.mkdir()
    ledger = str(tmp_path / "ledger")
    ref = _df(spark, [(i, i, "t1", float(i % 10 + 1)) for i in range(100)])
    bins = train_value_bins(ref, n_bins=4)

    def _run_srm():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        return (
            streaming_unit_deltas(stream)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(ledger)
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_srm"))
            .start()
        )

    _df(spark, [(0, 7, "t1", 3.0), (1, 8, "t1", 4.0)]).write.parquet(str(src / "b1"))
    q = _run_srm()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # restart; replay user 7 (no re-emit) + add user 9
    _df(spark, [(2, 7, "t1", 5.0), (3, 9, "t1", 6.0)]).write.parquet(str(src / "b2"))
    q2 = _run_srm()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows = [(r["t"], r["u"]) for r in spark.read.parquet(ledger).collect()]
    assert sorted(rows) == [("t1", "7"), ("t1", "8"), ("t1", "9")]

    # W1 restart: histogram state persists (memory sinks cannot
    # recover a checkpoint, so the emissions land in a parquet log)
    w1_log = str(tmp_path / "w1_log")

    def _run_w1():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        return (
            streaming_binned_w1_monitor(stream, bins, alarm_w1_milli=1e12)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(w1_log)
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_w1"))
            .start()
        )

    q3 = _run_w1()
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()
    _df(spark, [(10, 20, "t1", 7.0), (11, 21, "t1", 2.0)]).write.parquet(
        str(src / "b3")
    )
    q4 = _run_w1()
    try:
        q4.processAllAvailable()
        rows = spark.read.parquet(w1_log).collect()
    finally:
        q4.stop()
    last = max(rows, key=lambda r: r["n_a"] + r["n_b"])
    want = binned_w1(
        _df(
            spark,
            [(0, 7, "t1", 3.0), (1, 8, "t1", 4.0), (2, 7, "t1", 5.0),
             (3, 9, "t1", 6.0), (10, 20, "t1", 7.0), (11, 21, "t1", 2.0)],
        ),
        bins,
    )["t1"]
    assert (last["n_a"], last["n_b"], last["w1_milli"]) == want

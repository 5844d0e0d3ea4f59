"""Streaming SPRT monitor (X126 twin): the cross-batch integer LLR
walk must equal the batch fold bit-for-bit on the same events, the
decision must latch at its first crossing even when later data walks
the LLR back, and the state must survive a checkpoint restart."""

from __future__ import annotations

import datetime

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
    sprt_ab_test,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.sprt_stream import (
    streaming_sprt_monitor,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
T0 = datetime.datetime(2024, 1, 1)


def _df(spark, rows):
    # single output file per batch: the monitor's contract is
    # event-time-ordered arrival, and maxFilesPerTrigger=1 walks FILES
    # — a multi-part write would slice one logical batch into
    # arbitrarily-ordered micro-batches
    return spark.createDataFrame(rows, SCHEMA).coalesce(1)


def _row(eid, sec, etype, value):
    return (eid, T0 + datetime.timedelta(seconds=sec), 1, etype, value, None)


def test_sprt_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    b1 = [_row(i, i, "mix", 100.0 if i % 3 else 1.0) for i in range(30)]
    b2 = [_row(100 + i, 100 + i, "mix", 1.0 if i % 2 else 100.0) for i in range(40)]
    _df(spark, b1).write.parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_sprt_monitor(stream)
        .writeStream.format("memory")
        .queryName("sprt_mon")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _df(spark, b2).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        rows = spark.sql("select * from sprt_mon").collect()
    finally:
        q.stop()
    last = max(rows, key=lambda r: r["n_events"])
    want = sprt_ab_test(_df(spark, b1 + b2)).collect()[0]
    assert last["n_events"] == want["n_events"]
    assert last["n_success"] == want["n_success"]
    assert last["llr_micro_final"] == want["llr_micro_final"]
    assert last["decision"] == want["decision"]
    assert last["n_at_decision"] == want["n_at_decision"]
    assert last["llr_micro_at_decision"] == want["llr_micro_at_decision"]


def test_sprt_stream_decision_latches(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    # batch 1: 8 straight successes -> accept_h1 at n=8
    b1 = [_row(i, i, "t", 100.0) for i in range(8)]
    # batch 2: 40 straight failures walk the LLR far below the lower
    # boundary — the decision must stay accept_h1 at n=8
    b2 = [_row(100 + i, 100 + i, "t", 1.0) for i in range(40)]
    _df(spark, b1).write.parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_sprt_monitor(stream)
        .writeStream.format("memory")
        .queryName("sprt_latch")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = max(
            spark.sql("select * from sprt_latch").collect(),
            key=lambda r: r["n_events"],
        )
        assert first["decision"] == "accept_h1"
        assert first["n_at_decision"] == 8
        _df(spark, b2).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        rows = spark.sql("select * from sprt_latch").collect()
    finally:
        q.stop()
    last = max(rows, key=lambda r: r["n_events"])
    assert last["decision"] == "accept_h1"       # latched
    assert last["n_at_decision"] == 8
    assert last["llr_micro_final"] < 0           # LLR itself kept walking


def test_sprt_stream_multi_chunk_ordering(spark, tmp_path):
    """applyInPandasWithState splits a group's micro-batch into
    multiple Arrow chunks (arrow.maxRecordsPerBatch) with no
    cross-chunk ordering guarantee. The walk must concat-then-sort
    ONCE: here the file carries 20 successes (late ts) BEFORE 20
    failures (early ts), with a 16-row chunk size — per-chunk sorting
    would walk the successes first and latch accept_h1; the correct
    (ts, rid) walk latches accept_h0 at n=8."""
    src = tmp_path / "events"
    src.mkdir()
    fails = [_row(i, i, "t", 1.0) for i in range(20)]
    succs = [_row(100 + i, 100 + i, "t", 100.0) for i in range(20)]
    # file order: successes first (reverse of event-time order)
    _df(spark, succs + fails).write.parquet(str(src / "b1"))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        q = (
            streaming_sprt_monitor(stream)
            .writeStream.format("memory")
            .queryName("sprt_chunks")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("select * from sprt_chunks").collect()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    last = max(rows, key=lambda r: r["n_events"])
    want = sprt_ab_test(_df(spark, fails + succs)).collect()[0]
    assert last["decision"] == "accept_h0"
    assert last["n_at_decision"] == want["n_at_decision"] == 8
    assert last["llr_micro_at_decision"] == want["llr_micro_at_decision"]
    assert last["llr_micro_final"] == want["llr_micro_final"]
    assert last["n_events"] == 40


def test_sprt_stream_checkpoint_restart(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    log = str(tmp_path / "log")

    def _run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        return (
            streaming_sprt_monitor(stream)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(log)
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    _df(spark, [_row(i, i, "t", 100.0) for i in range(5)]).write.parquet(
        str(src / "b1")
    )
    q = _run()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    _df(spark, [_row(10 + i, 10 + i, "t", 100.0) for i in range(5)]).write.parquet(
        str(src / "b2")
    )
    q2 = _run()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows = spark.read.parquet(log).collect()
    last = max(rows, key=lambda r: r["n_events"])
    # 10 successes total, crossing at 8 — state carried across restart
    assert last["n_events"] == 10
    assert last["decision"] == "accept_h1"
    assert last["n_at_decision"] == 8
    want = sprt_ab_test(
        _df(spark, [_row(i, i, "t", 100.0) for i in range(5)]
            + [_row(10 + i, 10 + i, "t", 100.0) for i in range(5)])
    ).collect()[0]
    assert last["llr_micro_final"] == want["llr_micro_final"]


def test_sprt_stream_updates_match_daily_ledger(spark, tmp_path):
    """The batch sprt_daily_ledger (X142, the driver-witnessed
    readout) replays the stream's per-micro-batch update rows exactly
    under the file-per-day discipline: day D's update row == the
    ledger row for day D, including the latch."""
    import datetime as dt

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        sprt_daily_ledger,
    )

    src = tmp_path / "events"
    src.mkdir()
    # day 1: 5 successes (no crossing); day 2: 6 successes (crossing
    # at global n=8 inside day 2); day 3: failures (latched)
    days = [
        [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "t", 100.0, None) for i in range(5)],
        [(10 + i, dt.datetime(2024, 1, 2, 0, 0, i), 1, "t", 100.0, None) for i in range(6)],
        [(20 + i, dt.datetime(2024, 1, 3, 0, 0, i), 1, "t", 1.0, None) for i in range(4)],
    ]
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_sprt_monitor(stream)
        .writeStream.format("memory")
        .queryName("sprt_ledger_twin")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    seen = []
    try:
        for i, rows in enumerate(days):
            _df(spark, rows).write.parquet(str(src / f"b{i}"))
            q.processAllAvailable()
            upd = max(
                spark.sql("select * from sprt_ledger_twin").collect(),
                key=lambda r: r["n_events"],
            )
            seen.append(upd)
    finally:
        q.stop()
    ledger = {
        r["day"]: r
        for r in sprt_daily_ledger(
            _df(spark, [r for d in days for r in d])
        ).collect()
    }
    assert set(ledger) == {"2024-01-01", "2024-01-02", "2024-01-03"}
    for day, upd in zip(sorted(ledger), seen):
        lr = ledger[day]
        assert upd["n_events"] == lr["n_events_cum"], day
        assert upd["n_success"] == lr["n_success_cum"], day
        assert upd["llr_micro_final"] == lr["llr_micro_eod"], day
        assert upd["decision"] == lr["decision"], day
        assert upd["n_at_decision"] == lr["n_at_decision"], day
        assert upd["llr_micro_at_decision"] == lr["llr_micro_at_decision"], day
    assert [r["decision"] for r in seen] == ["continue", "accept_h1", "accept_h1"]

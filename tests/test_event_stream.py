"""Watermarked streaming window aggregation: stream the events table
file-by-file through the same window expression as the batch operator
and check the finalized windows agree with the batch result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
    tumbling_window_agg,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming import (
    windowed_event_counts,
)

from .conftest import SF_DIR


def test_streaming_windows_match_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")

    src = str(tmp_path / "stream_src")
    events.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = windowed_event_counts(stream, duration="1 hour", watermark="2 hours")

    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select window_start, event_type, n_events, sum_value from winagg"
        ).collect()
    finally:
        q.stop()

    expected = tumbling_window_agg(events).collect()
    key = lambda r: (r["window_start"], r["event_type"])
    got_map = {key(r): (r["n_events"], round(r["sum_value"], 6)) for r in got}
    exp_map = {key(r): (r["n_events"], round(r["sum_value"], 6)) for r in expected}
    assert got_map == exp_map


def test_streaming_sessions_match_batch(spark, tmp_path):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        session_window_agg,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming import (
        sessionized_event_counts,
    )

    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "sess_src")
    events.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    # files stream in arbitrary time order; a wide watermark keeps every
    # event on-time so the merged sessions must equal the batch result
    # (late-drop behavior itself is covered by the tumbling test above)
    agg = sessionized_event_counts(stream, gap="30 minutes", watermark="40 days")
    q = (
        agg.writeStream.format("memory")
        .queryName("sessagg")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select session_start, session_end, user_id, n_events from sessagg"
        ).collect()
    finally:
        q.stop()

    expected = session_window_agg(events, gap="30 minutes").collect()
    key = lambda r: (r["session_start"], r["session_end"], r["user_id"])
    assert {key(r): r["n_events"] for r in got} == {
        key(r): r["n_events"] for r in expected
    }


def test_dropduplicates_within_watermark_removes_redeliveries(spark, tmp_path):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.event_stream import (
        dedup_events_within_watermark,
    )

    events = load_table(spark, SF_DIR, "events").select("event_id", "ts", "event_type")
    src = str(tmp_path / "dup_src")
    # the same events written twice = at-least-once redelivery of every
    # record within the watermark horizon
    events.coalesce(1).write.mode("append").parquet(src)
    events.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = dedup_events_within_watermark(stream, watermark="30 days")
    q = (
        out.writeStream.format("memory")
        .queryName("streamdedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select event_id from streamdedup").collect()
    finally:
        q.stop()

    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids))  # no event delivered twice
    assert set(ids) == {r["event_id"] for r in events.collect()}  # none lost


def test_funnel_requires_order(spark):
    """A user whose purchase precedes their first click must count for
    view and click but not purchase."""
    from datetime import datetime

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        funnel_counts,
    )

    t = lambda m: datetime(2024, 1, 1, 12, m)
    rows = [
        # user 1: full ordered funnel
        (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # user 2: purchase BEFORE click -> reaches step 2 only
        (2, "view", t(0)), (2, "purchase", t(1)), (2, "click", t(2)),
        # user 3: click only -> reaches nothing (no view)
        (3, "click", t(0)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        (r["step"], r["event_type"]): r["n_users"]
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {
        (1, "view"): 2,
        (2, "click"): 2,
        (3, "purchase"): 1,
    }


def test_sessionize_matches_session_window_counts(spark):
    """Total sessions from sessionize must equal session_window_agg's
    row count (same gap), and per-event indices must be contiguous."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        session_window_agg,
        sessionize,
    )

    ev = load_table(spark, SF_DIR, "events")
    per_event = sessionize(ev, gap_minutes=30).select("user_id", "session_idx")
    n_sessions = per_event.distinct().count()
    n_windows = session_window_agg(ev, gap="30 minutes").count()
    assert n_sessions == n_windows
    # indices contiguous per user: max+1 == distinct count
    agg = per_event.groupBy("user_id").agg(
        F.max("session_idx").alias("mx"), F.count_distinct("session_idx").alias("n")
    )
    assert agg.filter(F.col("mx") + 1 != F.col("n")).count() == 0


def _ordered_stream_src(spark, events, tmp_path, n_files=4):
    """Write events as n_files parquet files covering increasing ts
    ranges, with strictly increasing mtimes so the file source replays
    them in timestamp order — the in-order-per-key delivery contract
    the row-level stateful twins document."""
    import glob
    import os
    import shutil

    src = str(tmp_path / "ordered_src")
    staging = str(tmp_path / "ordered_staging")
    (
        events.repartitionByRange(n_files, "ts")
        .sortWithinPartitions("ts")
        .write.parquet(staging)
    )
    os.makedirs(src)
    # range partitions are ordered by partition file name (part-00000
    # holds the lowest ts range); re-stamp mtimes in that order
    parts = sorted(glob.glob(f"{staging}/part-*.parquet"))
    first_ts = {}
    for p in parts:
        first_ts[p] = spark.read.parquet(p).agg(F.min("ts")).first()[0]
    parts.sort(key=lambda p: first_ts[p])
    for i, p in enumerate(parts):
        dst = f"{src}/file_{i:05d}.parquet"
        shutil.copy(p, dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return src


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        sessionize,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.event_stream import (
        streaming_sessionize,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts"
    )
    src = _ordered_stream_src(spark, events, tmp_path)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_sessionize(stream, gap_minutes=30, watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_rows")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["event_id"]): r["session_idx"]
            for r in spark.sql("select * from sess_rows").collect()
        }
    finally:
        q.stop()

    exp = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in sessionize(events, gap_minutes=30).collect()
    }
    # every event emitted before its user's state was evicted must
    # carry the batch session index; sessions whose users were evicted
    # by the closing watermark restart at 0, so compare only users
    # never evicted — with a 2h watermark vs 30m gap over sf0.001 no
    # eviction fires mid-stream, so the maps match exactly
    assert got == exp


def test_streaming_funnel_progress_matches_batch_counts(spark, tmp_path):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        funnel_counts,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.event_stream import (
        streaming_funnel_progress,
    )

    steps = ["view", "click", "purchase"]
    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    )
    src = _ordered_stream_src(spark, events, tmp_path)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_funnel_progress(stream, steps)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_prog")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # latest progress per user = their final max_step
        final = spark.sql(
            "select user_id, max(max_step) as max_step "
            "from funnel_prog group by user_id"
        ).collect()
    finally:
        q.stop()

    got = {
        i + 1: sum(1 for r in final if r["max_step"] >= i + 1)
        for i in range(len(steps))
    }
    exp = {
        r["step"]: r["n_users"]
        for r in funnel_counts(events, steps).collect()
    }
    assert got == exp


def test_streaming_sessionize_state_survives_restart(spark, tmp_path):
    """Kill the query mid-stream and restart from the checkpoint: the
    per-user cursors recover, so sessions spanning the restart keep
    their indexes and the full output still equals the batch result."""
    import glob
    import os
    import shutil

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        sessionize,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.event_stream import (
        streaming_sessionize,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts"
    )
    staged = _ordered_stream_src(spark, events, tmp_path)
    files = sorted(glob.glob(f"{staged}/file_*.parquet"))
    assert len(files) >= 4
    src = str(tmp_path / "restart_src")
    os.makedirs(src)
    sink = str(tmp_path / "restart_sink")
    ckpt = str(tmp_path / "restart_ckpt")
    schema = spark.read.parquet(staged).schema

    def run_until_drained():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            streaming_sessionize(stream, gap_minutes=30, watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def land(fs):
        # copy + re-stamp strictly increasing mtimes: shutil.copy gives
        # every file "now", and mtime ties let the source pick an
        # arbitrary order, breaking the in-order delivery contract
        for f in fs:
            dst = shutil.copy(f, src)
            i = int(os.path.basename(f).split("_")[1].split(".")[0])
            os.utime(dst, (1_800_000_000 + i * 10, 1_800_000_000 + i * 10))

    # lifetime 1: first half of the files
    land(files[: len(files) // 2])
    run_until_drained()
    # lifetime 2: remaining files land after the restart
    land(files[len(files) // 2 :])
    run_until_drained()

    # compare on the documented eviction-stable session key: a user
    # evicted between lifetimes restarts session_idx at 0, but with
    # in-order delivery an eviction implies the next event's gap
    # exceeds the session gap, so the batch splits there too and
    # (user_id, session_start) identifies sessions on both sides
    got = {
        (r["user_id"], r["event_id"]): r["session_start"]
        for r in spark.read.parquet(sink).collect()
    }
    batch = sessionize(events, gap_minutes=30)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "session_idx")
    exp = {
        (r["user_id"], r["event_id"]): r["session_start"]
        for r in batch.withColumn(
            "session_start", F.min(F.col("ts").cast("timestamp")).over(w)
        ).collect()
    }
    assert got == exp


def test_streaming_cohort_updates_match_batch(spark, tmp_path):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        cohort_retention,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.event_stream import (
        streaming_cohort_updates,
    )

    events = load_table(spark, SF_DIR, "events").select("user_id", "ts")
    src = _ordered_stream_src(spark, events, tmp_path)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_cohort_updates(stream, bucket_days=7)
    q = (
        out.writeStream.format("memory")
        .queryName("cohort_cells")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # sink-side rollup: distinct users per (cohort, offset) cell
        got = {
            (str(r["cohort_start"]), r["period_offset"]): r["n"]
            for r in spark.sql(
                "select cohort_start, period_offset, "
                "count(distinct user_id) as n "
                "from cohort_cells group by 1, 2"
            ).collect()
        }
    finally:
        q.stop()

    exp = {
        (r["cohort_start"], r["period_offset"]): r["n_users"]
        for r in cohort_retention(events, bucket_days=7).collect()
    }
    assert got == exp


def test_streaming_rolling_stats_match_batch(spark, tmp_path):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        rolling_user_stats,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.event_stream import (
        streaming_rolling_user_stats,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    src = _ordered_stream_src(spark, events, tmp_path)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_rolling_user_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("roll_feats")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["event_id"]: (
                r["prev_n"],
                round(r["prev_sum"], 6),
                r["hour_n"],
                round(r["hour_sum"], 6),
            )
            for r in spark.sql("select * from roll_feats").collect()
        }
    finally:
        q.stop()

    exp = {
        r["event_id"]: (
            r["prev_n"],
            round(r["prev_sum"] or 0.0, 6),
            r["hour_n"],
            round(r["hour_sum"] or 0.0, 6),
        )
        for r in rolling_user_stats(events).collect()
    }
    assert got == exp


def test_streaming_funnel_state_survives_restart(spark, tmp_path):
    """Funnel cursors recover from the checkpoint: step times resolved
    before the restart stay resolved, progress continues across the
    boundary, and the final per-user rollup equals the batch counts."""
    import glob
    import os
    import shutil

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        funnel_counts,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.event_stream import (
        streaming_funnel_progress,
    )

    steps = ["view", "click", "purchase"]
    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    )
    staged = _ordered_stream_src(spark, events, tmp_path)
    files = sorted(glob.glob(f"{staged}/file_*.parquet"))
    src = str(tmp_path / "fr_src")
    os.makedirs(src)
    sink = str(tmp_path / "fr_sink")
    ckpt = str(tmp_path / "fr_ckpt")
    schema = spark.read.parquet(staged).schema

    def run_until_drained():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        # update-mode stateful output + a file sink needs foreachBatch
        q = (
            streaming_funnel_progress(stream, steps)
            .writeStream.foreachBatch(
                lambda b, _bid: b.write.mode("append").parquet(sink)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def land(fs):
        for f in fs:
            dst = shutil.copy(f, src)
            i = int(os.path.basename(f).split("_")[1].split(".")[0])
            os.utime(dst, (1_900_000_000 + i * 10, 1_900_000_000 + i * 10))

    land(files[: len(files) // 2])
    run_until_drained()
    land(files[len(files) // 2 :])
    run_until_drained()

    final = (
        spark.read.parquet(sink)
        .groupBy("user_id")
        .agg(F.max("max_step").alias("max_step"))
        .collect()
    )
    got = {
        i + 1: sum(1 for r in final if r["max_step"] >= i + 1)
        for i in range(len(steps))
    }
    exp = {
        r["step"]: r["n_users"] for r in funnel_counts(events, steps).collect()
    }
    assert got == exp


def test_streaming_cohort_state_survives_restart(spark, tmp_path):
    """Cohort assignment is fixed at first sight and emitted cells are
    never re-emitted — both must hold ACROSS a checkpoint restart, and
    the post-restart rollup must equal the batch retention matrix."""
    import glob
    import os
    import shutil

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        cohort_retention,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.event_stream import (
        streaming_cohort_updates,
    )

    events = load_table(spark, SF_DIR, "events").select("user_id", "ts")
    staged = _ordered_stream_src(spark, events, tmp_path)
    files = sorted(glob.glob(f"{staged}/file_*.parquet"))
    src = str(tmp_path / "cr_src")
    os.makedirs(src)
    sink = str(tmp_path / "cr_sink")
    ckpt = str(tmp_path / "cr_ckpt")
    schema = spark.read.parquet(staged).schema

    def run_until_drained():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            streaming_cohort_updates(stream, bucket_days=7)
            .writeStream.foreachBatch(
                lambda b, _bid: b.write.mode("append").parquet(sink)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def land(fs):
        for f in fs:
            dst = shutil.copy(f, src)
            i = int(os.path.basename(f).split("_")[1].split(".")[0])
            os.utime(dst, (2_000_000_000 + i * 10, 2_000_000_000 + i * 10))

    land(files[: len(files) // 2])
    run_until_drained()
    land(files[len(files) // 2 :])
    run_until_drained()

    cells = spark.read.parquet(sink)
    # no cell is ever emitted twice (restart must not re-announce)
    assert (
        cells.groupBy("cohort_start", "period_offset", "user_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )
    got = {
        (str(r["cohort_start"]), r["period_offset"]): r["n"]
        for r in cells.groupBy("cohort_start", "period_offset")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exp = {
        (r["cohort_start"], r["period_offset"]): r["n_users"]
        for r in cohort_retention(events, bucket_days=7).collect()
    }
    assert got == exp


def test_streaming_reach_matches_batch(spark, tmp_path):
    """dropDuplicates → windowed count (two chained stateful operators)
    must reproduce the batch exact distinct reach window-for-window."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        window_distinct_users,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming import (
        windowed_reach,
    )

    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "reach_src")
    events.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    # wide watermark: files stream in arbitrary time order, so keep
    # every event on-time — the merged reach must equal batch exactly
    agg = windowed_reach(stream, duration="1 hour", watermark="40 days")
    q = (
        agg.writeStream.format("memory")
        .queryName("reachagg")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # append mode emits only watermark-finalized windows, and the
        # 40-day tolerance means none are final yet: push one flush
        # event 80 days past the end so every REAL window finalizes
        # (the flush's own window stays open and is never emitted)
        flush_ts = events.agg(F.max("ts")).first()[0] + __import__(
            "datetime"
        ).timedelta(days=80)
        spark.createDataFrame(
            [(10**9, flush_ts, 10**6, "flush", 0.0, "{}")], events.schema
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = spark.sql("select window_start, n_users from reachagg").collect()
    finally:
        q.stop()

    expected = window_distinct_users(events).collect()
    exp_map = {r["window_start"]: r["n_users"] for r in expected}
    got_map = {r["window_start"]: r["n_users"] for r in got}
    assert got_map == exp_map


def test_streaming_transitions_match_batch(spark, tmp_path):
    """Summing the emitted per-batch increments must reproduce the
    batch transition matrix exactly (counts; probabilities are a
    deterministic rollup of those counts)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        event_transitions,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.event_stream import (
        streaming_event_transitions,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    src = _ordered_stream_src(spark, events, tmp_path)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_event_transitions(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("transitions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select prev_type, next_type, sum(n) as n "
            "from transitions group by 1, 2"
        ).collect()
    finally:
        q.stop()

    exp = event_transitions(events).collect()
    got_map = {(r["prev_type"], r["next_type"]): r["n"] for r in got}
    exp_map = {(r["prev_type"], r["next_type"]): r["n"] for r in exp}
    assert got_map == exp_map


def test_streaming_transitions_survive_restart(spark, tmp_path):
    """Kill the query mid-stream and restart from the checkpoint: each
    user's last-event cursor recovers, so the transition spanning the
    restart boundary is still counted and the summed increments equal
    the batch matrix."""
    import glob
    import os
    import shutil

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        event_transitions,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.event_stream import (
        streaming_event_transitions,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    staged = _ordered_stream_src(spark, events, tmp_path)
    files = sorted(glob.glob(f"{staged}/file_*.parquet"))
    src = str(tmp_path / "trans_restart_src")
    os.makedirs(src)
    sink = str(tmp_path / "trans_restart_sink")
    ckpt = str(tmp_path / "trans_restart_ckpt")
    schema = spark.read.parquet(staged).schema

    def run_until_drained():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            streaming_event_transitions(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def land(fs):
        for f in fs:
            dst = shutil.copy(f, src)
            i = int(os.path.basename(f).split("_")[1].split(".")[0])
            os.utime(dst, (1_800_000_000 + i * 10, 1_800_000_000 + i * 10))

    land(files[: len(files) // 2])
    run_until_drained()
    land(files[len(files) // 2 :])
    run_until_drained()

    got = (
        spark.read.parquet(sink)
        .groupBy("prev_type", "next_type")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    got_map = {(r["prev_type"], r["next_type"]): r["n"] for r in got}
    exp_map = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in event_transitions(events).collect()
    }
    assert got_map == exp_map


def test_streaming_rollup_updates_match_batch_ivm(spark, tmp_path):
    """Bootstrap the snapshot as a first batch of upserts, then stream
    a CDC batch with moves/deletes/inserts: base(empty) + summed
    deltas must equal the from-scratch rollup of the merged table —
    and therefore equal what batch maintain_rollup computes."""
    import os

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.cdc import (
        merge_changes,
        rollup_of,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.event_stream import (
        streaming_rollup_updates,
    )

    snap = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    boot = snap.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.lit("upsert").alias("op"),
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    changes = snap.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("9-moved").alias("o_orderpriority"),
        (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 20 == 0, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.lit("2021-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    src = str(tmp_path / "cdc_src")
    os.makedirs(src)
    boot.coalesce(1).write.parquet(f"{src}/f0.parquet")
    changes.coalesce(1).write.parquet(f"{src}/f1.parquet")
    os.utime(f"{src}/f0.parquet", (1_800_000_000, 1_800_000_000))
    os.utime(f"{src}/f1.parquet", (1_800_000_100, 1_800_000_100))

    stream = (
        spark.readStream.schema(spark.read.parquet(f"{src}/f0.parquet").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*.parquet")
    )
    out = streaming_rollup_updates(
        stream, key="o_orderkey", group_col="o_orderpriority",
        sum_col="o_totalprice",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("rollup_updates")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select o_orderpriority, sum(d_n) as n, sum(d_sum_micro) as s "
            "from rollup_updates group by 1"
        ).collect()
    finally:
        q.stop()

    merged = merge_changes(snap, changes, key="o_orderkey")
    exp = rollup_of(merged, ["o_orderpriority"], ["o_totalprice"]).collect()
    got_map = {
        r["o_orderpriority"]: (r["n"], round(r["s"] / 1e6, 6))
        for r in got
        if r["n"] != 0 or r["s"] != 0
    }
    exp_map = {
        r["o_orderpriority"]: (r["n_rows"], round(float(r["sum_o_totalprice"]), 6))
        for r in exp
    }
    assert got_map == exp_map


def test_streaming_rollup_state_survives_restart(spark, tmp_path):
    """Kill the query between CDC batches and restart from the
    checkpoint: per-key (group, value) state recovers, so a change
    that debits a pre-restart upsert still emits the right delta and
    the prefix sum equals the from-scratch rollup."""
    import os

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.cdc import (
        merge_changes,
        rollup_of,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.event_stream import (
        streaming_rollup_updates,
    )

    snap = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    boot = snap.select(
        "o_orderkey", "o_orderpriority", "o_totalprice",
        F.lit("upsert").alias("op"),
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    changes = snap.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("9-moved").alias("o_orderpriority"),
        (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 20 == 0, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.lit("2021-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    src = str(tmp_path / "cdc_restart_src")
    os.makedirs(src)
    sink = str(tmp_path / "cdc_restart_sink")
    ckpt = str(tmp_path / "cdc_restart_ckpt")
    schema = boot.schema

    def run_until_drained():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/f*.parquet")
        )
        q = (
            streaming_rollup_updates(
                stream, key="o_orderkey", group_col="o_orderpriority",
                sum_col="o_totalprice",
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # lifetime 1: the bootstrap snapshot only
    boot.coalesce(1).write.parquet(f"{src}/f0.parquet")
    os.utime(f"{src}/f0.parquet", (1_800_000_000, 1_800_000_000))
    run_until_drained()
    # lifetime 2: the CDC batch lands after the restart — its deltas
    # must debit pre-images that live only in recovered state
    changes.coalesce(1).write.parquet(f"{src}/f1.parquet")
    os.utime(f"{src}/f1.parquet", (1_800_000_100, 1_800_000_100))
    run_until_drained()

    got = (
        spark.read.parquet(sink)
        .groupBy("o_orderpriority")
        .agg(F.sum("d_n").alias("n"), F.sum("d_sum_micro").alias("s"))
        .filter((F.col("n") != 0) | (F.col("s") != 0))
        .collect()
    )
    got_map = {
        r["o_orderpriority"]: (r["n"], round(r["s"] / 1e6, 6)) for r in got
    }
    merged = merge_changes(snap, changes, key="o_orderkey")
    exp_map = {
        r["o_orderpriority"]: (
            r["n_rows"], round(float(r["sum_o_totalprice"]), 6)
        )
        for r in rollup_of(merged, ["o_orderpriority"], ["o_totalprice"]).collect()
    }
    assert got_map == exp_map


def test_streaming_psi_drift_matches_reference(spark, tmp_path):
    """Per-window PSI from the stream equals the closed-form reference
    computed over the same windows with the same baseline histogram."""
    import math

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.profiling import (
        histogram_counts,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.event_stream import (
        streaming_psi_drift,
    )

    events = load_table(spark, SF_DIR, "events")
    # baseline: first half of the month
    cutoff = "2024-01-16"
    base = events.filter(F.col("ts") < F.lit(cutoff).cast("timestamp"))
    base_counts = histogram_counts(base, "value", 0.0, 500.0, n_bins=10)

    src = str(tmp_path / "psi_src")
    live = events.filter(F.col("ts") >= F.lit(cutoff).cast("timestamp"))
    live.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(live.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_psi_drift(
        stream, base_counts, duration="4 days", watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("psidrift")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from psidrift").collect()
    finally:
        q.stop()

    # closed-form reference over the same 4-day windows
    rows = live.select("ts", "value").collect()
    per_window: dict = {}
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    win_s = 4 * 86400
    for r in rows:
        sec = (r["ts"] - epoch).total_seconds()
        wstart = epoch + datetime.timedelta(seconds=(sec // win_s) * win_s)
        bins = per_window.setdefault(wstart, [0] * 10)
        b = min(max(int(r["value"] // 50.0), 0), 9)
        bins[b] += 1
    tb = sum(base_counts)
    got_map = {(r["window_start"], r["bin"]): r for r in got}
    assert {w for w, _ in got_map} == set(per_window)
    for wstart, bins in per_window.items():
        tc = sum(bins)
        for i in range(10):
            r = got_map[(wstart, i)]
            assert r["cur_count"] == bins[i]
            assert r["base_count"] == base_counts[i]
            pb = (base_counts[i] + 0.5) / (tb + 5.0)
            pc = (bins[i] + 0.5) / (tc + 5.0)
            want = round((pc - pb) * math.log(pc / pb), 6)
            assert abs(r["psi_contrib"] - want) < 2e-6, (wstart, i)

"""Streaming Count-Min (streaming/sketch_stream.py): the running
counter table after any stream prefix must be BIT-IDENTICAL to the
batch sketch over the same rows (mergeability made executable), and
it must survive a checkpoint restart without double counting.
"""

from __future__ import annotations

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sketches import (
    countmin_cells,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming import (
    streaming_countmin,
)

SCHEMA = "event_id long, user_id long"
DEPTH, WIDTH = 4, 32


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _batch_counters(spark, rows):
    import pyspark.sql.functions as F

    return {
        (r["j"], r["bucket"]): r["c"]
        for r in countmin_cells(_df(spark, rows), "user_id", DEPTH, WIDTH)
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    }


def _start(spark, src, ckpt, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    return (
        streaming_countmin(stream, "user_id", DEPTH, WIDTH)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(ckpt))
        .start()
    )


def test_streaming_counters_match_batch_prefixes(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    b1 = [(i, i % 9) for i in range(40)]
    b2 = [(100 + i, (i * 7) % 15) for i in range(60)]
    _df(spark, b1).write.parquet(str(src / "b1"))

    q = _start(spark, src, tmp_path / "ckpt", "cm_live")
    try:
        q.processAllAvailable()
        got1 = {
            (r["j"], r["bucket"]): r["c"]
            for r in spark.sql("select * from cm_live").collect()
        }
        assert got1 == _batch_counters(spark, b1)

        _df(spark, b2).write.mode("append").parquet(str(src / "b2"))
        q.processAllAvailable()
        got2 = {
            (r["j"], r["bucket"]): r["c"]
            for r in spark.sql("select * from cm_live").collect()
        }
        assert got2 == _batch_counters(spark, b1 + b2)
        # bounded state: never more than d*w cells
        assert len(got2) <= DEPTH * WIDTH
        # cell-wise mergeability: batch1 + batch2 tables sum to the union's
        c1, c2 = _batch_counters(spark, b1), _batch_counters(spark, b2)
        merged = {
            k: c1.get(k, 0) + c2.get(k, 0) for k in set(c1) | set(c2)
        }
        assert merged == got2
    finally:
        q.stop()


def test_streaming_countmin_checkpoint_restart(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    b1 = [(i, i % 5) for i in range(30)]
    b2 = [(200 + i, i % 11) for i in range(30)]
    _df(spark, b1).write.parquet(str(src / "b1"))

    ckpt = tmp_path / "ckpt"
    q = _start(spark, src, ckpt, "cm_a")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _df(spark, b2).write.mode("append").parquet(str(src / "b2"))
    q2 = _start(spark, src, ckpt, "cm_b")
    try:
        q2.processAllAvailable()
        got = {
            (r["j"], r["bucket"]): r["c"]
            for r in spark.sql("select * from cm_b").collect()
        }
        assert got == _batch_counters(spark, b1 + b2)
    finally:
        q2.stop()


def _batch_kmv(spark, rows, k):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sketches import (
        kmv_distinct,
    )

    return {
        r["user_id"]: (r["k_used"], r["est_distinct"])
        for r in kmv_distinct(
            _df(spark, rows).selectExpr(
                "cast(user_id as string) user_id", "event_id"
            ),
            "user_id",
            "event_id",
            k=k,
        ).collect()
    }


def _start_kmv(spark, src, ckpt, name, k):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming import (
        streaming_kmv_distinct,
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    return (
        streaming_kmv_distinct(stream, "user_id", "event_id", k=k)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .start()
    )


def _latest_kmv(spark, table):
    # update-mode memory sink appends each batch's emission; k_used is
    # monotone per group, so max k_used row = latest synopsis state
    rows = spark.sql(
        f"select * from {table} order by group, k_used"
    ).collect()
    out = {}
    for r in rows:
        out[r["group"]] = (r["k_used"], r["est_distinct"])
    return out


def test_streaming_kmv_matches_batch_prefix(spark, tmp_path):
    """After each prefix the streaming synopsis estimate equals the
    batch kmv_distinct over the same rows (k-min of union == k-min of
    synopsis ∪ new batch), both under and over capacity."""
    src = tmp_path / "events"
    src.mkdir()
    k = 16
    # group "1": 12 distinct keys (under capacity); "2": 40 (over)
    b1 = [(i, 1) for i in range(12)] + [(100 + i, 2) for i in range(25)]
    b2 = [(i, 1) for i in range(12)] + [(125 + i, 2) for i in range(15)]
    _df(spark, b1).write.parquet(str(src / "b1"))

    q = _start_kmv(spark, src, tmp_path / "ckpt", "kmv_live", k)
    try:
        q.processAllAvailable()
        got = _latest_kmv(spark, "kmv_live")
        want = {
            g: (ku, ed) for g, (ku, ed) in _batch_kmv(spark, b1, k).items()
        }
        for g, (ku, ed) in want.items():
            assert got[g][0] == ku
            assert abs(got[g][1] - ed) < 1e-3, (g, got[g], ed)

        _df(spark, b2).write.mode("append").parquet(str(src / "b2"))
        q.processAllAvailable()
        got = _latest_kmv(spark, "kmv_live")
        want = _batch_kmv(spark, b1 + b2, k)
        for g, (ku, ed) in want.items():
            assert got[g][0] == ku
            assert abs(got[g][1] - ed) < 1e-3, (g, got[g], ed)
        # under capacity the stream reports the exact distinct count
        assert got["1"] == (12, 12.0)
    finally:
        q.stop()


def test_streaming_kmv_checkpoint_restart(spark, tmp_path):
    """The synopsis array survives a stop/restart: the resumed stream
    merges new batches into the checkpointed k-min state (update-mode
    stateful output + a file sink needs foreachBatch — memory sinks
    cannot recover in update mode)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming import (
        streaming_kmv_distinct,
    )

    src = tmp_path / "events"
    src.mkdir()
    out = str(tmp_path / "out")
    k = 8
    b1 = [(i, 7) for i in range(30)]
    b2 = [(200 + i, 7) for i in range(30)]
    _df(spark, b1).write.parquet(str(src / "b1"))

    def _run():
        from pyspark.sql import functions as F

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        return (
            streaming_kmv_distinct(stream, "user_id", "event_id", k=k)
            .writeStream.foreachBatch(
                # stamp the batch id: update mode appends one row per
                # update and k_used saturates at k, so "the final
                # state" must be selected by recency, not by k_used
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

    _df(spark, b2).write.mode("append").parquet(str(src / "b2"))
    q2 = _run()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    final = (
        spark.read.parquet(out)
        .orderBy("bid", ascending=False)
        .collect()[0]
    )
    want = _batch_kmv(spark, b1 + b2, k)["7"]
    assert final["k_used"] == want[0]
    assert abs(final["est_distinct"] - want[1]) < 1e-3

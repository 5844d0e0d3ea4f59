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

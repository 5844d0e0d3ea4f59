"""parallelize_narrow's spread heuristic (utils.py): fires on a small
single-file scan, stays a no-op when the byte-estimated split count
already covers the cluster (VERDICT r9 item 4 — raw file count
undercounts splits on large splittable files)."""

from __future__ import annotations

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.utils import (
    parallelize_narrow,
)


def _has_spread(df) -> bool:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "Repartition" in plan


def test_spread_fires_on_small_single_file(spark, tmp_path):
    p = str(tmp_path / "small")
    spark.range(100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = parallelize_narrow(df)
    assert _has_spread(out), "small single-file scan should be spread"


def test_spread_noop_when_bytes_imply_enough_splits(spark, tmp_path):
    p = str(tmp_path / "wide")
    # ~100 KB of parquet in one file; with maxPartitionBytes forced to
    # 4 KB the scan splits into >= threshold byte ranges, so the spread
    # must NOT add a shuffle even though n_files == 1
    spark.range(50_000).selectExpr(
        "id", "cast(id as string) as s"
    ).coalesce(1).write.parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4k")
    try:
        df = spark.read.parquet(p)
        out = parallelize_narrow(df)
        assert not _has_spread(out), (
            "byte-splittable single file must not be round-robined"
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_spread_noop_on_in_memory_frame(spark):
    df = spark.range(10)
    out = parallelize_narrow(df)
    assert out is df

"""File-layout writers (sources/layout.py): range clustering produces
disjoint per-file stats that make predicate skipping possible, and
compaction merges small files without changing the data."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.layout import (
    compact_files,
    write_clustered,
)

from .conftest import SF_DIR


def _file_date_ranges(path: str, col: str):
    """[(min, max)] of `col` per parquet file, from footer stats only."""
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    return ranges


def test_clustered_write_has_disjoint_file_ranges(spark, tmp_path):
    out = str(tmp_path / "orders_by_date")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    write_clustered(orders, out, ["o_orderdate"], num_files=8)

    ranges = sorted(_file_date_ranges(out, "o_orderdate"))
    assert len(ranges) >= 4
    for (_, prev_max), (nxt_min, _) in zip(ranges, ranges[1:]):
        assert nxt_min >= prev_max

    # skipping evidence: a one-month predicate overlaps O(1) files,
    # not all of them — this is what the clustering buys at 100 TB
    lo, hi = ranges[0][0], ranges[-1][1]
    probe_lo = lo + (hi - lo) // 2
    probe_hi = probe_lo + (hi - lo) // 20
    touched = sum(1 for mn, mx in ranges if mx >= probe_lo and mn <= probe_hi)
    assert touched <= 2, (touched, ranges)

    # round trip is lossless and the predicate reaches the scan
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    plan = (
        back.filter(F.col("o_orderdate") >= str(probe_lo))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "o_orderdate" in plan


def test_compact_files_reduces_count_preserves_rows(spark, tmp_path):
    out = str(tmp_path / "small_files")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    orders.repartition(32).write.mode("overwrite").parquet(out)
    before_files = len(glob.glob(f"{out}/*.parquet"))
    before_rows = orders.count()

    after_files = compact_files(spark, out, target_file_mb=128)
    assert after_files < before_files
    assert spark.read.parquet(out).count() == before_rows

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


def test_zorder_write_localizes_both_columns(spark, tmp_path):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.layout import (
        write_zorder,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    zout = str(tmp_path / "li_zorder")
    rout = str(tmp_path / "li_range")
    write_zorder(li, zout, ["l_partkey", "l_suppkey"], num_files=16)
    write_clustered(li, rout, ["l_partkey"], num_files=16)

    def mean_span_frac(path, col):
        ranges = _file_date_ranges(path, col)
        glo = min(mn for mn, _ in ranges)
        ghi = max(mx for _, mx in ranges)
        width = (ghi - glo) or 1
        return sum((mx - mn) / width for mn, mx in ranges) / len(ranges)

    # range clustering: first column tight, second column spans ~the
    # whole domain in every file (no skipping possible on it)
    assert mean_span_frac(rout, "l_partkey") < 0.3
    assert mean_span_frac(rout, "l_suppkey") > 0.8

    # z-order: BOTH columns localized — with 16 files each dimension
    # should cover ~16^(-1/2) = 25% of its domain per file on average
    zp = mean_span_frac(zout, "l_partkey")
    zs = mean_span_frac(zout, "l_suppkey")
    assert zp < 0.6 and zs < 0.6, (zp, zs)
    assert zp + zs < mean_span_frac(rout, "l_partkey") + mean_span_frac(
        rout, "l_suppkey"
    )

    # lossless
    assert (
        spark.read.parquet(zout).count() == li.count()
    )


def test_zvalue_matches_python_interleave(spark):
    """Integer-exact Morton code (operators/layout.py): engine column
    vs a literal python bit-interleave over the normalized inputs."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.layout import (
        with_zvalue,
    )

    rows = [(x, y) for x in [0, 1, 7, 63, 64, 999] for y in [0, 3, 17, 999]]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["__zx"], r["__zy"]): r["z"]
           for r in with_zvalue(df, F.col("x"), F.col("y")).collect()}

    xs = [x for x, _ in rows]
    ys = [y for _, y in rows]
    xmin, xmax, ymin, ymax = min(xs), max(xs), min(ys), max(ys)

    def u16(v, lo, hi):
        return ((v - lo) * 65535) // max(hi - lo, 1)

    def interleave(ux, uy):
        z = 0
        for i in range(16):
            z |= ((ux >> i) & 1) << (2 * i)
            z |= ((uy >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == interleave(u16(x, xmin, xmax), u16(y, ymin, ymax)), (x, y)


def test_zonemap_zones_are_tight_rectangles(spark):
    """The data-skipping claim, quantified: the average per-zone extent
    on BOTH dimensions is a small fraction of the global range (a
    1-D sort would leave the second dimension spanning ~everything)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.layout import (
        zorder_zonemap,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    zm = zorder_zonemap(
        li, F.col("l_partkey"), F.col("l_suppkey"), bucket_bits=6
    ).collect()
    assert sum(r["n"] for r in zm) == li.count()

    gx = max(r["x_max"] for r in zm) - min(r["x_min"] for r in zm) or 1
    gy = max(r["y_max"] for r in zm) - min(r["y_min"] for r in zm) or 1
    fx = sum((r["x_max"] - r["x_min"]) / gx for r in zm) / len(zm)
    fy = sum((r["y_max"] - r["y_min"]) / gy for r in zm) / len(zm)
    # 2^6 = 64 zones → each dimension should cover ~64^(-1/2) ≈ 12.5%
    # of its domain per zone; allow generous slack for skewed fill
    assert fx < 0.5 and fy < 0.5, (fx, fy)

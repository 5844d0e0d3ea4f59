"""HLL approx_count_distinct: rows-only at the driver, so pin the
relative-error bound against the exact count here."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans.queries import (
    q_approx_distinct,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR


def test_approx_distinct_within_error(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in q_approx_distinct(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, ex in exact.items():
        # rsd=0.02 requested; allow 3× slack for small cardinalities
        assert abs(approx[k] - ex) <= max(3, 0.06 * ex), (k, approx[k], ex)

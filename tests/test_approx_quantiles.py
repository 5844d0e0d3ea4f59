"""approx_percentile sketch: rows-only at the driver, so pin the
rank-error bound against the exact interpolated quantiles here.

GK with accuracy=1000 guarantees rank error <= n/1000; translate that
to a value tolerance by checking the approximate quantile's true rank
is within the bound.
"""

from __future__ import annotations

import bisect

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans.queries import (
    q_approx_quantiles,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR


def test_approx_quantiles_rank_error(spark):
    approx = {r["event_type"]: r for r in q_approx_quantiles(spark, SF_DIR).collect()}
    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])

    assert set(approx) == set(by_type)
    for etype, vals in by_type.items():
        vals.sort()
        n = len(vals)
        for col, q in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75)):
            v = approx[etype][col]
            # true rank window of the returned value
            lo = bisect.bisect_left(vals, v)
            hi = bisect.bisect_right(vals, v)
            target = q * n
            # GK bound: |rank - target| <= n/accuracy (+1 slack for ties)
            tol = n / 1000 + 1
            assert lo - tol <= target <= hi + tol, (etype, col, v, lo, hi, target)

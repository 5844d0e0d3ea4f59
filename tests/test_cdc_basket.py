"""Semantics pins for SCD2 historization and market-basket lift."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.basket import (
    copurchase_lift,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.cdc import (
    scd2_build,
)


def _changes(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_scd2_collapses_consecutive_duplicates(spark):
    """A A B A -> three intervals (the repeat A extends, the return to
    A after B opens a NEW interval — type 2, not type 1)."""
    rows = [
        (1, "2024-01-01 00:00:00", 7, "A"),
        (2, "2024-01-02 00:00:00", 7, "A"),
        (3, "2024-01-03 00:00:00", 7, "B"),
        (4, "2024-01-04 00:00:00", 7, "A"),
    ]
    out = sorted(
        scd2_build(_changes(spark, rows)).collect(), key=lambda r: r["valid_from"]
    )
    assert [r["event_type"] for r in out] == ["A", "B", "A"]
    # intervals chain: each valid_to equals the next valid_from
    assert out[0]["valid_to"] == out[1]["valid_from"]
    assert out[1]["valid_to"] == out[2]["valid_from"]
    assert out[2]["valid_to"] is None and out[2]["is_current"]
    assert not out[0]["is_current"] and not out[1]["is_current"]


def test_scd2_same_ts_tiebreak_is_deterministic(spark):
    """Two changes at the identical timestamp order by the tiebreak
    column, so the later event_id wins the open interval."""
    rows = [
        (1, "2024-01-01 00:00:00", 7, "A"),
        (2, "2024-01-01 00:00:00", 7, "B"),
    ]
    out = sorted(scd2_build(_changes(spark, rows)).collect(),
                 key=lambda r: not r["is_current"])
    assert out[0]["event_type"] == "B" and out[0]["is_current"]
    assert out[1]["event_type"] == "A" and out[1]["valid_to"] is not None


def test_scd2_users_are_independent(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1, "A"),
        (2, "2024-01-02 00:00:00", 2, "A"),
    ]
    out = scd2_build(_changes(spark, rows)).collect()
    assert len(out) == 2 and all(r["is_current"] for r in out)


def _li(spark, rows):
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def _part(spark, rows):
    return spark.createDataFrame(rows, "p_partkey long, p_brand string")


def test_copurchase_lift_hand_example(spark):
    """4 orders; brands X,Y co-occur in 2; X alone in 1, Y alone in 1.
    support = 2/4 = 500 milli; conf(X->Y) = 2/3 = 666; lift =
    4*2/(3*3) = 0.888 -> 888 milli."""
    li = _li(spark, [
        (1, 10), (1, 20),   # X,Y
        (2, 11), (2, 21),   # X,Y
        (3, 12),            # X
        (4, 22),            # Y
    ])
    part = _part(spark, [
        (10, "X"), (11, "X"), (12, "X"),
        (20, "Y"), (21, "Y"), (22, "Y"),
    ])
    out = copurchase_lift(li, part, min_pair_orders=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("X", "Y")
    assert r["n_orders_pair"] == 2 and r["n_orders_a"] == 3 and r["n_orders_b"] == 3
    assert r["support_milli"] == 500
    assert r["confidence_milli"] == 666
    assert r["lift_milli"] == 888


def test_copurchase_duplicate_lines_count_once(spark):
    """Two lineitems of the same brand in one order contribute ONE
    (order, brand) membership — distinct-first semantics."""
    li = _li(spark, [(1, 10), (1, 11), (1, 20)])
    part = _part(spark, [(10, "X"), (11, "X"), (20, "Y")])
    out = copurchase_lift(li, part, min_pair_orders=1).collect()
    assert len(out) == 1
    assert out[0]["n_orders_pair"] == 1 and out[0]["n_orders_a"] == 1


def test_copurchase_min_pair_orders_filter(spark):
    li = _li(spark, [(1, 10), (1, 20)])
    part = _part(spark, [(10, "X"), (20, "Y")])
    assert copurchase_lift(li, part, min_pair_orders=2).count() == 0


def test_gap_fill_inserts_zero_hours(spark):
    """Events at hours 0 and 2 (type A), hour 1 (type B) -> a 2x3
    dense grid with explicit zeros for the silent cells."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        gap_fill_hourly,
    )

    rows = [
        (1, "2024-01-01 00:10:00", 1, "A"),
        (2, "2024-01-01 02:20:00", 1, "A"),
        (3, "2024-01-01 01:30:00", 1, "B"),
        (4, "2024-01-01 01:40:00", 1, "B"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r["event_type"], r["hour_start"]): r["n_events"]
           for r in gap_fill_hourly(df).collect()}
    assert len(out) == 6
    assert out[("A", "2024-01-01 00:00:00")] == 1
    assert out[("A", "2024-01-01 01:00:00")] == 0
    assert out[("A", "2024-01-01 02:00:00")] == 1
    assert out[("B", "2024-01-01 00:00:00")] == 0
    assert out[("B", "2024-01-01 01:00:00")] == 2
    assert out[("B", "2024-01-01 02:00:00")] == 0

"""Incremental view maintenance (operators/cdc.py:maintain_rollup):
the maintained rollup must equal rollup_of(merge_changes(...)) — the
from-scratch recompute — on adversarial change batches."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.cdc import (
    maintain_rollup,
    merge_changes,
    rollup_of,
)

GROUPS = ["grp"]
SUMS = ["val"]


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, grp string, val double")


def _changes(spark, rows):
    return spark.createDataFrame(
        [(k, g, v, op, datetime(2024, 1, 1, 0, 0, s)) for s, (k, g, v, op) in enumerate(rows)],
        "k long, grp string, val double, op string, ts timestamp",
    )


def _check(spark, snap_rows, change_rows):
    snap = _snap(spark, snap_rows)
    changes = _changes(spark, change_rows)
    base = rollup_of(snap, GROUPS, SUMS)
    got = maintain_rollup(base, snap, changes, "k", GROUPS, SUMS).collect()
    merged = merge_changes(snap, changes, key="k")
    exp = rollup_of(merged, GROUPS, SUMS).collect()
    to_map = lambda rs: {
        r["grp"]: (r["n_rows"], float(r["sum_val"])) for r in rs
    }
    assert to_map(got) == to_map(exp)
    return to_map(got)


def test_group_move_debits_and_credits(spark):
    got = _check(
        spark,
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)],
        [(1, "b", 11.0, "upsert")],  # row 1 moves a -> b
    )
    assert got == {"a": (1, 20.0), "b": (2, 16.0)}


def test_group_drops_out_when_count_reaches_zero(spark):
    got = _check(
        spark,
        [(1, "a", 10.0), (2, "b", 1.0)],
        [(1, "a", 0.0, "delete")],
    )
    assert got == {"b": (1, 1.0)}


def test_delete_of_unknown_key_is_noop(spark):
    got = _check(spark, [(1, "a", 10.0)], [(99, "z", 5.0, "delete")])
    assert got == {"a": (1, 10.0)}


def test_insert_creates_new_group(spark):
    got = _check(spark, [(1, "a", 10.0)], [(2, "c", 7.5, "upsert")])
    assert got == {"a": (1, 10.0), "c": (1, 7.5)}


def test_null_values_sum_as_zero_but_count(spark):
    got = _check(
        spark,
        [(1, "a", None), (2, "a", 3.0)],
        [(3, "a", None, "upsert"), (1, "a", None, "delete")],
    )
    assert got == {"a": (2, 3.0)}


def test_latest_change_per_key_wins(spark):
    # key 1: upsert then delete (later ts) -> deleted
    got = _check(
        spark,
        [(1, "a", 10.0), (2, "a", 1.0)],
        [(1, "b", 99.0, "upsert"), (1, "b", 0.0, "delete")],
    )
    assert got == {"a": (1, 1.0)}


def test_preimage_join_broadcasts_change_keys(spark):
    """Scale pin: in the FINAL adaptive plan the pre-image lookup must
    be a BroadcastHashJoin on the key (AQE sees the tiny change side at
    runtime), so the snapshot is probed, never shuffled. The rollup ↔
    delta merge stays a full-outer SortMergeJoin on the group columns —
    both of its sides are GROUP-cardinality, which is exactly the size
    that does not matter at 100 TB."""
    import re

    snap = _snap(spark, [(i, "g%d" % (i % 3), float(i)) for i in range(100)])
    changes = _changes(spark, [(1, "g0", 5.0, "upsert")])
    base = rollup_of(snap, GROUPS, SUMS)
    out = maintain_rollup(base, snap, changes, "k", GROUPS, SUMS)
    out.collect()  # finalize AQE re-planning
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the current (starred) plan tree, not stale pre-AQE subtrees
    final = [l for l in plan.splitlines() if "*(" in l]
    assert any(
        re.search(r"BroadcastHashJoin \[k#\d+L\]", l) for l in final
    ), plan
    assert not any(
        re.search(r"SortMergeJoin \[k#\d+L\]", l) for l in final
    ), plan


def test_null_group_is_one_group(spark):
    """A NULL group value is a real group in GROUP BY semantics: the
    rollup's NULL row and the delta's NULL row must MERGE (null-safe
    join), not emit two unmerged rows."""
    got = _check(
        spark,
        [(1, None, 10.0), (2, None, 4.0), (3, "a", 1.0)],
        [(4, None, 6.0, "upsert"), (1, "a", 2.0, "upsert")],  # 1 moves NULL->a
    )
    assert got == {None: (2, 10.0), "a": (2, 3.0)}

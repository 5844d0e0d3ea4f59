"""Temporal join operators — as-of join and range join.

Spark has no native ASOF JOIN (kdb+/Flink/DuckDB do); the naive
formulation is a range self-join that explodes at scale. Both operators
here are expressed so Catalyst plans them as ONE key shuffle plus
narrow work — the standard large-scale formulations:

- **as-of join** (union + last-over-window): tag both sides, union,
  and for each left row take the most recent preceding right row via
  ``last(..., ignorenulls=True)`` over a (key, ts)-sorted window.
  Cost: one shuffle on the key, one sort per partition — identical to
  the shuffle any equi-join on the key would pay, and independent of
  time-range density. This beats a range-condition join, which Spark
  would execute as BroadcastNestedLoop or a per-key cartesian.

- **range join** (bin + equi-join): to count right rows within a
  trailing window of each left row without a cross join, bucket time
  into bins of at least the window width; a right row in bin b can only
  serve left rows in bins {b, b+1}, so duplicating the right side 2×
  turns the range predicate into a bin equi-join + residual filter.
  Shuffle volume is |left| + 2|right|, never |left|×|right|.

These generalize the reference's event-time reasoning (its ledger
orders status transitions by server timestamps and resolves the current
state as latest-wins; ``main.py:110-152``) to first-class temporal
analytics the LLM-pipeline extension set needs (sessionized joins,
"most recent signal before event X" features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Left as-of join: each left row gains the payload of the most
    recent right row with the same key and ``right_ts <= left_ts``
    (nulls when no such row exists).

    Right payload column names (everything except key/ts) must not
    collide with left's — rename before calling. Ties within the right
    side on (key, ts) are resolved arbitrarily; pre-dedupe for
    determinism.

    Plan shape: one Exchange on ``key``, one sort by (ts, side), one
    Window node computing all payload fills — verified in
    tests/test_temporal.py.
    """
    rpay = [c for c in right.columns if c not in (key, right_ts)]
    collisions = set(rpay) & set(left.columns)
    if collisions:
        raise ValueError(f"right payload columns collide with left: {sorted(collisions)}")

    l2 = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rpay],
    )
    r2 = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *[F.col(c) for c in rpay],
    )
    # __side orders right rows before left rows at equal ts, making the
    # join boundary inclusive (right_ts == left_ts matches), same as
    # DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`.
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in rpay:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).select(*left.columns, *rpay)


def interval_join_batch(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
) -> DataFrame:
    """Batch twin of streaming.interval_join_attribution: every
    (purchase, click) pair for the same user with
    ``purchase_ts - horizon <= click_ts <= purchase_ts``.

    Unlike range_join_trailing_count there IS a key equality here, so
    Catalyst plans a plain shuffled equi-join on user_id with the time
    range as a residual filter — one key shuffle, per-user fanout
    bounded by the horizon. No binning needed.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").cast("timestamp").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").cast("timestamp").alias("purchase_ts"),
        "value",
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts", "value")


def range_join_trailing_count(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_us: int = 300_000_000,
    out_col: str = "n_in_window",
) -> DataFrame:
    """For each left row, count right rows with
    ``left_ts - window < right_ts <= left_ts`` (no key equality — a pure
    range join), via time-binning instead of a cross join.

    Bin width == window width, so each left bin b only needs right bins
    {b-1, b}: the right side is exploded into the two left bins it can
    serve and joined on bin equality, then the exact range predicate is
    applied as a residual filter. Each (left, right) pair meets at most
    once because a left row has exactly one bin.
    """
    lcols = list(left.columns)
    # cast handles TIMESTAMP_NTZ inputs (unix_micros requires TIMESTAMP);
    # value-preserving because engine sessions pin UTC
    l2 = left.withColumn(
        "__lus", F.unix_micros(F.col(left_ts).cast("timestamp"))
    ).withColumn("__bin", F.floor(F.col("__lus") / window_us))
    r2 = (
        right.withColumn("__rus", F.unix_micros(F.col(right_ts).cast("timestamp")))
        .withColumn("__rbin", F.floor(F.col("__rus") / window_us))
        .select(
            "__rus",
            F.explode(F.array(F.col("__rbin"), F.col("__rbin") + 1)).alias("__bin"),
        )
    )
    hit = (F.col("__rus") <= F.col("__lus")) & (
        F.col("__rus") > F.col("__lus") - F.lit(window_us)
    )
    return (
        l2.join(r2, "__bin", "left")
        .groupBy(*[F.col(c) for c in lcols], F.col("__lus"))
        .agg(F.count(F.when(hit, F.lit(1))).alias(out_col))
        .select(*lcols, out_col)
    )


def multi_touch_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    model: str = "position",
) -> DataFrame:
    """Multi-touch attribution over the interval join: split each
    purchase's value across the clicks that preceded it within
    `horizon`. Models:

    - ``linear``: every touch gets 1/n of the credit;
    - ``position`` (U-shaped 40/20/40): first and last touch get 0.4
      each, the middle touches split 0.2 (n=1 → 1.0, n=2 → 0.5/0.5).

    Shape: the interval join's one user-keyed shuffle, then per-purchase
    windows (fanout bounded by the horizon, so no skewed partitions).
    Deterministic touch order: (click_ts, click_id). Returns
    (purchase_id, click_id, n_touches, touch_rank, credit,
    credited_value) with credit/credited_value rounded to 6 dp.
    """
    from pyspark.sql import Window

    j = interval_join_batch(clicks, purchases, horizon)
    w = Window.partitionBy("purchase_id")
    w_ord = Window.partitionBy("purchase_id").orderBy("click_ts", "click_id")
    n = F.count(F.lit(1)).over(w)
    rnk = F.row_number().over(w_ord)
    if model == "linear":
        credit = F.lit(1.0) / n
    elif model == "position":
        credit = (
            F.when(n == 1, F.lit(1.0))
            .when(n == 2, F.lit(0.5))
            .when((rnk == 1) | (rnk == n), F.lit(0.4))
            .otherwise(F.lit(0.2) / (n - 2))
        )
    else:
        raise ValueError(f"unknown attribution model: {model!r}")
    return j.select(
        "purchase_id",
        "click_id",
        n.alias("n_touches"),
        rnk.alias("touch_rank"),
        F.round(credit, 6).alias("credit"),
        F.round(credit * F.col("value"), 6).alias("credited_value"),
    )


def gap_fill_hourly(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-series gap fill: a dense hourly grid per group between the
    corpus-wide min and max hour, with explicit zero rows for silent
    hours — the resample step every downstream window/trend operator
    assumes (a missing bucket is NOT the same as a zero bucket).

    Scale shape: the fact table aggregates once (map-side-combined
    (group, hour) counts); the dense grid is |groups| × |hours| —
    dimension-sized, built from a 1-row bounds aggregate exploded
    through `sequence()` and cross-joined against the distinct groups
    (both sides broadcast-small; the grid then broadcast-left-joins
    the counts ... which shuffles nothing at all when counts are
    aggregate-sized, and one exchange otherwise). Counts stay exact
    BIGINT; the hour label serializes to a string at the boundary.
    """
    hour = F.date_trunc("hour", F.col(ts_col).cast("timestamp"))
    counts = (
        events.select(F.col(group_col).alias("g"), hour.alias("h"))
        .groupBy("g", "h")
        .agg(F.count("*").alias("n"))
    )
    bounds = events.select(hour.alias("h")).agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    hours = bounds.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h")
    )
    groups = events.select(F.col(group_col).alias("g")).distinct()
    grid = groups.crossJoin(F.broadcast(hours))
    out = grid.join(counts, ["g", "h"], "left")
    return out.select(
        F.col("g").alias(group_col),
        F.date_format(F.col("h").cast("timestamp"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_start"
        ),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
    )

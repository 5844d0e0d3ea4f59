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


def kaplan_meier(
    events: DataFrame,
    unit_col: str = "user_id",
    ts_col: str = "ts",
    censor_horizon_days: int = 7,
) -> DataFrame:
    """Kaplan-Meier survival curve of unit "lifetimes" — per user, the
    days between first and last activity; a unit still active within
    ``censor_horizon_days`` of the corpus end is right-censored (its
    true lifetime is only known to exceed the observed one). This is
    the standard retention estimator when the observation window cuts
    churn off mid-flight.

    Scale shape: ONE groupBy(unit) for (first, last) dates, a 1-row
    global max broadcast, then everything runs on the per-duration
    aggregate (≤ observation-window-days rows) — the cumulative
    product is a window over that tiny frame (non-foldable constant
    partition key, class_weights convention). The estimator
    S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) is computed as
    exp(Σ ln(1 − d/n)): d, n are exact integers, the ln/exp chain runs
    on identical operands in any engine, and the output rounds to
    6 dp. A duration that kills the whole risk set (d == n) pins S to
    exactly 0 from there on (ln(0) is never evaluated).

    Output: (duration_days, n_risk, n_events, n_censored, survival).
    """
    per_unit = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.min(F.to_date(ts_col)).alias("d0"),
        F.max(F.to_date(ts_col)).alias("d1"),
    )
    horizon = per_unit.agg(F.max("d1").alias("dmax"))
    lifet = per_unit.crossJoin(F.broadcast(horizon)).select(
        F.datediff("d1", "d0").cast("long").alias("duration_days"),
        (
            F.col("d1") <= F.date_sub(F.col("dmax"), censor_horizon_days)
        )
        .cast("long")
        .alias("observed"),
    )
    per_dur = lifet.groupBy("duration_days").agg(
        F.sum("observed").alias("n_events"),
        F.sum(F.lit(1) - F.col("observed")).alias("n_censored"),
    )
    wall = Window.partitionBy(F.col("duration_days") % 1).orderBy("duration_days")
    wcum = wall.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wprev = wall.rowsBetween(Window.unboundedPreceding, -1)
    wtot = Window.partitionBy(F.col("duration_days") % 1)
    cum = per_dur.select(
        "duration_days",
        "n_events",
        "n_censored",
        (
            F.sum(F.col("n_events") + F.col("n_censored")).over(wtot)
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(wprev),
                F.lit(0),
            )
        ).alias("n_risk"),
    )
    frac = F.col("n_events").cast("double") / F.col("n_risk").cast("double")
    ln_term = F.when(F.col("n_events") < F.col("n_risk"), F.log(1.0 - frac))
    hit_zero = F.max((F.col("n_events") == F.col("n_risk")).cast("int")).over(wcum)
    return cum.select(
        "duration_days",
        "n_risk",
        "n_events",
        "n_censored",
        F.round(
            F.when(hit_zero == 1, F.lit(0.0)).otherwise(
                F.exp(F.sum(ln_term).over(wcum))
            ),
            6,
        ).alias("survival"),
    )


# EWMA milli-weights: round(1000 * 0.3 * 0.7^k) for lag k = 0..13.
# Baked as literals so no runtime pow() has to agree across engines —
# the whole smoothing path is integer arithmetic.
EWMA_MILLI_WEIGHTS = [300, 210, 147, 103, 72, 50, 35, 25, 18, 12, 8, 6, 4, 3]


def ewma_smooth(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Exponentially-weighted moving average of each group's daily
    value series (α = 0.3, 14-day support) — the trend line behind
    volume-drift alerts, computed gap-aware (missing days contribute
    no weight, the classic adjust=True normalization).

    Integer-exact end to end: daily totals are DECIMAL(18,6) sums
    (order-free) integerized to millis, the weight for lag k is a
    baked milli literal (no runtime pow()), and the EWMA is an
    integer-weighted integer sum divided with `div`. Scale shape: one
    map-side-combined groupBy(group, day) collapses events to a tiny
    per-day frame; each day then explodes its ≤14 contributing lags
    and an equi-join on (group, exact day) pulls them in — a shuffle
    of the AGGREGATE (days × 14), never of raw events, and no range
    join.

    Output: (group, day, y_milli, ewma_milli); day formatted as a
    string for stable cross-engine hashing.
    """
    daily = events.groupBy(
        F.col(group_col).alias("g"), F.to_date(ts_col).alias("d")
    ).agg(
        (F.sum(F.col(value_col).cast("decimal(18,6)")) * 1000)
        .cast("long")
        .alias("y_milli")
    )
    wlit = F.array(*[F.lit(w) for w in EWMA_MILLI_WEIGHTS])
    anchors = daily.select(
        "g",
        F.col("d").alias("anchor_d"),
        F.explode(F.sequence(F.lit(0), F.lit(len(EWMA_MILLI_WEIGHTS) - 1))).alias(
            "k"
        ),
    ).select(
        "g",
        "anchor_d",
        "k",
        F.date_sub(F.col("anchor_d"), F.col("k")).alias("d"),
    )
    contrib = anchors.join(daily, ["g", "d"]).select(
        "g",
        "anchor_d",
        (F.col("y_milli") * F.element_at(wlit, F.col("k") + 1)).alias("wy"),
        F.element_at(wlit, F.col("k") + 1).alias("w"),
    )
    sm = contrib.groupBy("g", "anchor_d").agg(
        F.sum("wy").alias("__swy"), F.sum("w").alias("__sw")
    )
    out = sm.join(
        daily.select("g", F.col("d").alias("anchor_d"), "y_milli"),
        ["g", "anchor_d"],
    )
    return out.select(
        F.col("g").alias(group_col),
        F.date_format(F.col("anchor_d"), "yyyy-MM-dd").alias("day"),
        "y_milli",
        F.expr("__swy div __sw").alias("ewma_milli"),
    )


def anomaly_mad(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier profile via the median absolute
    deviation: modified z-score 0.6745·(x − median)/MAD, the
    Iglewicz-Hodges rule that a mean/stddev gate fails on exactly the
    heavy-tailed data it is meant to police.

    Two exact-percentile passes over the fact table (median, then MAD
    on deviations — an irreducible data dependency) plus one scoring
    pass; each pass is a map-side-combined aggregate and the tiny
    per-group medians travel by broadcast. At corpus scale the same
    shape runs on approx_percentile sketches (see `approx_quantiles`)
    — exact percentile here keeps the oracle comparison sharp.

    Output: (group, n, median, mad, n_outliers, max_score).
    """
    med = events.groupBy(F.col(group_col).alias("g")).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = events.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).join(F.broadcast(med), "g")
    mad = dev.groupBy("g").agg(
        F.expr("percentile(abs(v - med), 0.5)").alias("mad")
    )
    scored = dev.join(F.broadcast(mad), "g").withColumn(
        "score",
        F.when(
            F.col("mad") > 0,
            F.lit(0.6745) * (F.col("v") - F.col("med")) / F.col("mad"),
        ).otherwise(F.lit(0.0)),
    )
    out = scored.groupBy("g").agg(
        F.max("n").alias("n"),
        F.max("med").alias("__med"),
        F.max("mad").alias("__mad"),
        F.sum((F.abs(F.col("score")) > threshold).cast("long")).alias(
            "n_outliers"
        ),
        F.max(F.abs(F.col("score"))).alias("__maxs"),
    )
    return out.select(
        F.col("g").alias(group_col),
        "n",
        F.round("__med", 6).alias("median"),
        F.round("__mad", 6).alias("mad"),
        "n_outliers",
        F.round("__maxs", 6).alias("max_score"),
    )


def _daily_units(
    events: DataFrame, group_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """(g, d, y): per-group daily value totals in whole units — an
    exact DECIMAL sum floored to BIGINT, so every downstream moment
    is integer arithmetic that cannot drift with partition order.
    floor() is explicit because a bare decimal→long cast truncates in
    Spark but ROUNDS in DuckDB — the oracle would diverge on any
    fractional total."""
    return events.groupBy(
        F.col(group_col).alias("g"), F.to_date(ts_col).alias("d")
    ).agg(
        F.floor(F.sum(F.col(value_col).cast("decimal(18,6)")))
        .cast("long")
        .alias("y")
    )


def autocorrelation(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    max_lag: int = 7,
) -> DataFrame:
    """Daily-series autocorrelation r_k for lags 1..max_lag per group
    — the seasonality/persistence fingerprint (a weekly cycle shows
    as a spike at lag 7) computed from closed-form integer sums.

    The series mean/variance and every lag's cross-moment are exact
    BIGINT sums over the daily aggregate (whole-unit totals keep
    y·y products inside long range); r_k is scalar double arithmetic
    on them — no data-ordered float accumulation anywhere. The lag
    pairing uses window ROW lags filtered by the true day gap —
    valid because days strictly increase, so a day-lag-k partner sits
    at most k rows back — which keeps events to ONE scan and runs the
    lag expansion and the series moments on the same per-group
    exchange of the daily aggregate (a self-join formulation would
    rescan events once per reference).

    Output: (group, lag, n_pairs, acf) rounded to 6 dp, using the
    standard estimator with the full-series mean:
    r_k = Σ(y_t−ȳ)(y_{t−k}−ȳ) / Σ(y_t−ȳ)².
    """
    daily = _daily_units(events, group_col, ts_col, value_col)
    word = Window.partitionBy("g").orderBy("d")
    wg = Window.partitionBy("g")
    windowed = daily.select(
        "g",
        "d",
        "y",
        F.count(F.lit(1)).over(wg).alias("n"),
        F.sum("y").over(wg).alias("s"),
        F.sum(F.col("y") * F.col("y")).over(wg).alias("ss"),
        *[
            F.lag("d", j).over(word).alias(f"__d{j}")
            for j in range(1, max_lag + 1)
        ],
        *[
            F.lag("y", j).over(word).alias(f"__y{j}")
            for j in range(1, max_lag + 1)
        ],
    )
    lagged = windowed.select(
        "g",
        "y",
        "n",
        "s",
        "ss",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.datediff(F.col("d"), F.col(f"__d{j}")).alias("lag"),
                        F.col(f"__y{j}").alias("y_lag"),
                    )
                    for j in range(1, max_lag + 1)
                ]
            )
        ).alias("p"),
    ).select(
        "g", "y", "n", "s", "ss",
        F.col("p.lag").alias("lag"),
        F.col("p.y_lag").alias("y_lag"),
    ).filter(
        F.col("y_lag").isNotNull() & (F.col("lag") <= max_lag)
    )
    j = lagged.groupBy("g", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("y") * F.col("y_lag")).alias("spp"),
        F.sum("y").alias("sp1"),
        F.sum("y_lag").alias("sp0"),
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.max("ss").alias("ss"),
    )
    ybar = F.col("s").cast("double") / F.col("n").cast("double")
    num = (
        F.col("spp").cast("double")
        - ybar * F.col("sp1").cast("double")
        - ybar * F.col("sp0").cast("double")
        + F.col("n_pairs").cast("double") * ybar * ybar
    )
    den = F.col("ss").cast("double") - F.col("n").cast("double") * ybar * ybar
    return j.filter(den > 0).select(
        F.col("g").alias(group_col),
        F.col("lag").cast("long").alias("lag"),
        "n_pairs",
        F.round(num / den, 6).alias("acf"),
    )


def seasonal_profile(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Day-of-week seasonal index per group: how each weekday's
    average daily-equivalent value compares to the group's overall
    average (index 1.0 = flat). The canonical "is traffic weekly-
    cyclic, and which days carry it" profile.

    Value mass is exact (DECIMAL sums → cents as BIGINT); the index
    is the ratio of exact integer cross-products, evaluated in
    scalar doubles and rounded to 6 dp. Per-weekday partials ride
    one map-side-combined groupBy; group totals re-aggregate those
    ≤7 rows via a window (non-foldable constant key).

    Output: (group, dow (1=Sunday..7=Saturday, Spark dayofweek),
    n_events, total_cents, index).
    """
    per_dow = events.groupBy(
        F.col(group_col).alias("g"),
        F.dayofweek(F.to_date(ts_col)).cast("long").alias("dow"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.sum(F.col(value_col).cast("decimal(18,6)")) * 100)
        .cast("long")
        .alias("total_cents"),
    )
    wg = Window.partitionBy("g")
    with_tot = per_dow.select(
        "g",
        "dow",
        "n_events",
        "total_cents",
        F.sum("n_events").over(wg).alias("__n_all"),
        F.sum("total_cents").over(wg).alias("__c_all"),
    )
    index = (
        F.col("total_cents").cast("double")
        * F.col("__n_all").cast("double")
    ) / (
        F.col("n_events").cast("double") * F.col("__c_all").cast("double")
    )
    return with_tot.select(
        F.col("g").alias(group_col),
        "dow",
        "n_events",
        "total_cents",
        F.round(index, 6).alias("index"),
    )


def cusum_drift(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """CUSUM control chart summary per group: the maximum absolute
    cumulative deviation of the daily series from its own mean, and
    the day it peaks — "did this feed's level shift, and when". A
    mean shift of size δ starting at day s makes the peak land near
    the shift point with deviation ≈ δ·(n−s).

    Integer-exact argmax: the deviation comparison runs on
    |n·S_t − t·S| (all BIGINT — no division before the compare), so
    peak selection is total and deterministic; only the reported
    magnitude divides by n at the boundary (round 6). The cumulative
    sum is a window per group over the daily aggregate; ties on the
    deviation break to the earliest day.

    Output: (group, n_days, peak_day, max_abs_cusum).
    """
    daily = _daily_units(events, group_col, ts_col, value_col)
    word = Window.partitionBy("g").orderBy("d")
    wg = Window.partitionBy("g")
    cum = daily.select(
        "g",
        "d",
        F.sum("y").over(word).alias("s_t"),
        F.row_number().over(word).cast("long").alias("t"),
        F.sum("y").over(wg).alias("s"),
        F.count(F.lit(1)).over(wg).alias("n_days"),
    )
    dev = cum.withColumn(
        "dev_int",
        F.abs(F.col("n_days") * F.col("s_t") - F.col("t") * F.col("s")),
    )
    pick = Window.partitionBy("g").orderBy(F.col("dev_int").desc(), F.col("d"))
    return (
        dev.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("g").alias(group_col),
            "n_days",
            F.date_format("d", "yyyy-MM-dd").alias("peak_day"),
            F.round(
                F.col("dev_int").cast("double") / F.col("n_days").cast("double"),
                6,
            ).alias("max_abs_cusum"),
        )
    )


def rolling_zscore(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    lookback: int = 7,
    min_history: int = 3,
) -> DataFrame:
    """Day-over-history anomaly score: each day's total against the
    mean/std of the previous ``lookback`` observed days — the rolling
    control band that catches "today is 4σ off its own trailing week"
    without a global model.

    The trailing moments are integer sums (whole-unit daily totals
    from the shared helper) over a ROWS frame per group — exact, so
    the sample std closed form √((k·Σy²−(Σy)²)/(k·(k−1))) and the z
    score are scalar double math, rounded to 6 dp. Days with fewer
    than ``min_history`` prior observations or zero variance are
    omitted. One scan; windows partition by the group key.

    Output: (group, day, y, z).
    """
    daily = _daily_units(events, group_col, ts_col, value_col)
    word = Window.partitionBy("g").orderBy("d")
    frame = word.rowsBetween(-lookback, -1)
    rolled = daily.select(
        "g",
        "d",
        "y",
        F.count(F.lit(1)).over(frame).cast("long").alias("k"),
        F.sum("y").over(frame).alias("s"),
        F.sum(F.col("y") * F.col("y")).over(frame).alias("ss"),
    ).filter(F.col("k") >= min_history)
    kd = F.col("k").cast("double")
    mean = F.col("s").cast("double") / kd
    var = (kd * F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s").cast("double")) / (
        kd * (kd - 1.0)
    )
    return rolled.filter(var > 0).select(
        F.col("g").alias(group_col),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "y",
        F.round((F.col("y").cast("double") - mean) / F.sqrt(var), 6).alias("z"),
    )


def forecast_backtest(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's total as
    the average of the SAME WEEKDAY's totals from all prior weeks
    (expanding window), score MAE and WAPE per group — the baseline
    every fancier forecaster must beat, and the shape every backtest
    shares (as-of features only, no leakage: the frame ends at 1
    PRECEDING).

    Integer-exact end to end: daily totals are floored BIGINT units
    (_daily_units); the prediction is defined in milli-units via
    integer div (1000*sum_prior div n_prior), so the absolute errors,
    MAE and WAPE are exact integers — no float accumulates across
    rows. Days with no prior same-weekday history are unscored.

    Scale shape: one map-side-combined daily aggregate, one window
    over the (group, weekday) daily series (|days| rows, not events),
    one final groupBy. Output per group: (group, n_days_scored,
    mae_milli, wape_milli).
    """
    daily = _daily_units(events, group_col, ts_col, value_col)
    w = (
        Window.partitionBy("g", F.dayofweek("d"))
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = daily.select(
        "g",
        (F.col("y") * 1000).alias("y_milli"),
        F.sum("y").over(w).alias("prior_sum"),
        F.count(F.lit(1)).over(w).alias("prior_n"),
    ).where(F.col("prior_n") >= 1)
    err = F.abs(
        F.col("y_milli") - F.expr("(1000 * prior_sum) div prior_n")
    )
    agg = scored.select("g", F.col("y_milli"), err.alias("e")).groupBy(
        "g"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days_scored"),
        F.sum("e").cast("long").alias("__se"),
        F.sum("y_milli").cast("long").alias("__sy"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_days_scored",
        F.expr("__se div n_days_scored").alias("mae_milli"),
        F.expr("(1000 * __se) div __sy").alias("wape_milli"),
    )


def forecast_conformal(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    coverage_milli: int = 900,
) -> DataFrame:
    """Split-conformal prediction intervals on the seasonal-naive
    backtest: per group, the first (chronological) half of scored days
    calibrates the interval half-width as an order statistic of the
    absolute residuals — k = ceil(q·n_cal), the distribution-free
    conformal rank — and the second half is a genuine holdout whose
    empirical coverage the output reports. The honest version of
    "the forecast is ±X": calibrated on the past, validated on data
    the calibration never saw.

    Integer-exact end to end: residuals are the backtest's milli-unit
    errors, the quantile is an index (row_number over the calibration
    residual sort, k = (q·n + 999) div 1000 — no interpolation), and
    coverage is (1000·hits) div n_test. Nothing floats, so the oracle
    comparison carries no drift.

    Scale shape: windows run over the DAILY aggregate (|days| rows,
    never events); the calibration quantile is a per-group rank — one
    shuffle on the group key — and the holdout join-back is a
    broadcast of |groups| half-widths.

    Returns (group, n_cal, n_test, halfwidth_milli, coverage_milli).
    """
    daily = _daily_units(events, group_col, ts_col, value_col)
    w_prior = (
        Window.partitionBy("g", F.dayofweek("d"))
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = daily.select(
        "g",
        "d",
        (F.col("y") * 1000).alias("y_milli"),
        F.sum("y").over(w_prior).alias("prior_sum"),
        F.count(F.lit(1)).over(w_prior).alias("prior_n"),
    ).where(F.col("prior_n") >= 1)
    resid = scored.select(
        "g",
        "d",
        F.abs(
            F.col("y_milli") - F.expr("(1000 * prior_sum) div prior_n")
        ).alias("e"),
    )
    # chronological split: day-rank ≤ n/2 calibrates, the rest tests
    w_rank = Window.partitionBy("g").orderBy("d")
    w_all = Window.partitionBy("g")
    split = resid.select(
        "g",
        "e",
        F.row_number().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("n_all"),
    ).withColumn("is_cal", F.col("rk") <= F.expr("n_all div 2"))

    cal = split.filter("is_cal")
    w_cal_rank = Window.partitionBy("g").orderBy("e", "rk")
    cal_ranked = cal.select(
        "g",
        "e",
        F.row_number().over(w_cal_rank).alias("erk"),
        F.count(F.lit(1)).over(w_all).alias("n_cal"),
    )
    halfwidth = cal_ranked.filter(
        F.col("erk") == F.expr(f"({coverage_milli} * n_cal + 999) div 1000")
    ).select(
        "g",
        F.col("n_cal").cast("long").alias("n_cal"),
        F.col("e").alias("halfwidth_milli"),
    )

    test = split.filter(~F.col("is_cal")).select("g", "e")
    cov = (
        test.join(F.broadcast(halfwidth), "g")
        .groupBy("g", "n_cal", "halfwidth_milli")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum((F.col("e") <= F.col("halfwidth_milli")).cast("long"))
            .cast("long")
            .alias("__hits"),
        )
    )
    return cov.select(
        F.col("g").alias(group_col),
        "n_cal",
        "n_test",
        "halfwidth_milli",
        F.expr("(1000 * __hits) div n_test").alias("coverage_milli"),
    )


def changepoint_detect(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Optimal single changepoint per daily series — the first step of
    binary segmentation: the split that minimizes left-SSE + right-SSE
    (i.e. the best two-mean fit). CUSUM (X46) says *whether* the level
    drifted and in which direction; this names the day the series is
    best cut in two and how much variance that cut explains — the
    localization answer an incident review asks for.

    Closed form, no iteration: per-group day index + prefix sums
    (Σy, Σy²) via windows on the daily aggregate (exact integers from
    `_daily_units`; squares carried as DECIMAL(38,0)); every candidate
    split's cost is scalar double algebra on those exact sums —
    cost(k) = (ssq_k − s_k²/k) + ((SSQ−ssq_k) − (S−s_k)²/(n−k)) —
    and the winner resolves in a (cost, day) row_number window. The
    windows partition by the group key: parallel across groups, width
    = days per group.

    Returns (group, n_days, split_day, sse_reduction_milli): the split
    day is the LAST day of the left segment; reduction is
    1000·(1 − best_cost/total_sse) for groups with total_sse > 0.
    """
    daily = _daily_units(events, group_col, ts_col, value_col)
    dec = "decimal(38,0)"
    w = Window.partitionBy("g").orderBy("d")
    wall = Window.partitionBy("g")
    cum = (
        daily.withColumn("t", F.row_number().over(w).cast("long"))
        .withColumn("sk", F.sum("y").over(w).cast("long"))
        .withColumn(
            "ssqk", F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).over(w)
        )
        .withColumn("n", F.count(F.lit(1)).over(wall).cast("long"))
        .withColumn("s_tot", F.sum("y").over(wall).cast("long"))
        .withColumn(
            "ssq_tot",
            F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).over(wall),
        )
    )
    td = F.col("t").cast("double")
    nd = F.col("n").cast("double")
    sk = F.col("sk").cast("double")
    st = F.col("s_tot").cast("double")
    left = F.col("ssqk").cast("double") - sk * sk / td
    right = (F.col("ssq_tot").cast("double") - F.col("ssqk").cast("double")) - (
        st - sk
    ) * (st - sk) / (nd - td)
    total_sse = F.col("ssq_tot").cast("double") - st * st / nd
    cand = cum.where(F.col("t") < F.col("n")).select(
        "g",
        "d",
        "n",
        (left + right).alias("cost"),
        total_sse.alias("total_sse"),
    )
    pick = Window.partitionBy("g").orderBy("cost", "d")
    return (
        cand.where(F.col("total_sse") > 0)
        .withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            F.col("g").alias(group_col),
            F.col("n").alias("n_days"),
            F.date_format(F.col("d"), "yyyy-MM-dd").alias("split_day"),
            F.round(1000.0 * (F.lit(1.0) - F.col("cost") / F.col("total_sse")), 3)
            .alias("sse_reduction_milli"),
        )
    )


def holt_winters_forecast(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha_milli: int = 500,
    beta_milli: int = 300,
    horizon: int = 7,
) -> DataFrame:
    """Holt's linear (double exponential) smoothing per daily series,
    forecast ``horizon`` days out — the level+trend upgrade over EWMA
    (X44 smooths level only) and the model the seasonal-naive backtest
    (X51) benchmarks against.

    Integer milli end to end: level/trend state lives in milli-units
    of the daily total, every recurrence step is integer
    multiply-add + truncating div (identical `div` semantics stated
    explicitly in the oracle for negative trends), so the fold is
    bit-identical in any engine — no float accumulation across steps.
    L_1 = 1000·y_1, B_1 = 1000·(y_2−y_1); for t ≥ 3:
    L_t = (α·1000·y_t + (1000−α)·(L+B)) div 1000,
    B_t = (β·(L_t − L_prev) + (1000−β)·B) div 1000;
    forecast(h) = L_n + h·B_n.

    Scale shape: ONE shuffle collects each group's ordered daily
    array (bounded by days-per-group — the autocorrelation bound);
    the recurrence is a per-row F.aggregate fold (no driver loop, no
    per-step actions); the horizon fan-out is a literal-array explode.
    Returns (group, n_days, h, forecast_milli) for h = 1..horizon,
    groups with ≥3 days.
    """
    a, b, m = int(alpha_milli), int(beta_milli), 1000
    daily = _daily_units(events, group_col, ts_col, value_col)
    series = (
        daily.groupBy("g")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "y"))), lambda x: x["y"]
            ).alias("ys")
        )
        .where(F.size("ys") >= 3)
    )
    # the fold is assembled as a SQL expression: `div` states the exact
    # truncating-division semantics the oracle mirrors for negatives
    state = series.select(
        "g",
        F.size("ys").cast("long").alias("n_days"),
        F.expr(
            f"""aggregate(
                 slice(ys, 3, size(ys) - 2),
                 struct(CAST({m} * element_at(ys, 1) AS BIGINT) AS l,
                        CAST({m} * (element_at(ys, 2) - element_at(ys, 1)) AS BIGINT) AS b),
                 (acc, y) -> struct(
                   CAST(({a} * {m} * y + {m - a} * (acc.l + acc.b)) div {m} AS BIGINT) AS l,
                   CAST(({b} * ((({a} * {m} * y + {m - a} * (acc.l + acc.b)) div {m}) - acc.l)
                         + {m - b} * acc.b) div {m} AS BIGINT) AS b)
               )"""
        ).alias("st"),
    )
    hs = F.array(*[F.lit(h) for h in range(1, horizon + 1)])
    return state.select(
        F.col("g").alias(group_col),
        "n_days",
        F.explode(hs).alias("h"),
        (F.col("st.l") + F.col("h").cast("long") * F.col("st.b"))
        .cast("long")
        .alias("forecast_milli"),
    )


def interval_merge(
    orders: DataFrame,
    key_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    id_col: str = "o_orderkey",
    value_col: str = "o_totalprice",
    span_days: int = 7,
) -> DataFrame:
    """Merge overlapping per-key activity intervals into episodes
    (round 6) — the gaps-and-islands primitive behind session stitching,
    coverage calendars, and PII span coalescing: each order opens a
    half-open interval [day, day + span_days); intervals that overlap
    (gap < span_days) merge into one episode, a gap >= span_days starts
    a new one.

    Integer-exact: days since 1970-01-01 as BIGINT, the island flag is
    `day >= running_max(prior interval ends)` (classic ROWS UNBOUNDED
    PRECEDING .. 1 PRECEDING max), the episode id a running sum of
    flags — every decision an integer comparison, so islands replay
    identically in any engine.

    Scale shape: one shuffle on the key (both windows and the final
    groupBy share the (key, day, id) sort — a single Exchange+Sort
    pipeline), per-key state is the window frame only. No self-join,
    no explode: linear in rows, parallel across keys.

    Returns (key, episode_start, episode_end, n_orders,
    total_value_cents) — the value sum in exact integer cents.
    """
    base = orders.select(
        F.col(key_col).alias("k"),
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).cast("long").alias("d"),
        F.col(id_col).alias("i"),
        F.col(value_col).alias("v"),
    )
    w = Window.partitionBy("k").orderBy("d", "i")
    prev_end = F.max(F.col("d") + span_days).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.withColumn(
        "__new",
        F.when(prev_end.isNull() | (F.col("d") >= prev_end), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ep = flagged.groupBy("k", "__island").agg(
        F.min("d").alias("__s"),
        F.max(F.col("d") + span_days).alias("__e"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("v") * 100).cast("long")).cast("long").alias(
            "total_value_cents"
        ),
    )
    epoch = F.lit("1970-01-01").cast("date")
    return ep.select(
        F.col("k").alias(key_col),
        F.date_format(F.date_add(epoch, F.col("__s").cast("int")), "yyyy-MM-dd").alias(
            "episode_start"
        ),
        F.date_format(F.date_add(epoch, F.col("__e").cast("int")), "yyyy-MM-dd").alias(
            "episode_end"
        ),
        "n_orders",
        "total_value_cents",
    )


def dtw_distance(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    max_cells: int = 1_000_000,
) -> DataFrame:
    """Dynamic Time Warping distance between every pair of groups'
    daily-count series (round 6) — the classic elastic similarity for
    time series (Sakoe & Chiba 1978): unlike pointwise L1, DTW aligns
    shifted/stretched activity patterns, the standard measure for
    "which metrics move alike, possibly with a lag".

    Exact integer DP, engine-replayable: each group's series is its
    daily event count over its own [first, last] day range (gaps = 0,
    all BIGINT); the n×m DP runs row-major as ONE F.aggregate fold
    over cell indices 2..n·m with the growing DP table as the
    accumulator — cell c = |a_i − b_j| + min(left, up, diag) with
    boundary CASEs — identical cell order and integer min in the
    DuckDB recursive-CTE oracle, so the distance matches bit-for-bit.

    Scale shape: one daily rollup (map-side combined), one |groups|-row
    series build, one broadcast self-join over group pairs; the DP is
    per-pair narrow compute — never a per-cell shuffle. The fold
    appends one cell per step, so the element-copy cost is
    O((n·m)²) and the final accumulator is one n·m-cell array per
    pair: fine for day-bounded series (a 365-day pair is 133k cells),
    ruinous for multi-year ones (2,400 days → 5.8M cells). Nothing
    upstream enforces the day bound, so ``max_cells`` (default 1e6 ≈
    a 3-year×1-year pair) HARD-FAILS any pair whose DP would exceed
    it — a loud per-pair error naming the offending types beats an
    executor OOM hours in (r6 ADVICE). Coarsen the bucketing (weekly
    rollup upstream) or raise the cap explicitly for longer series.

    Returns (type_a, type_b, n_a, n_b, dtw), pairs alphabetical.
    """
    daily = (
        events.where(F.col(group_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(group_col).alias("t"),
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
            .cast("long")
            .alias("d"),
        )
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    series = (
        daily.groupBy("t")
        .agg(
            F.min("d").alias("mn"),
            F.max("d").alias("mx"),
            F.map_from_entries(F.collect_list(F.struct("d", "c"))).alias("__m"),
        )
        .select(
            "t",
            F.transform(
                F.sequence(F.lit(0), (F.col("mx") - F.col("mn")).cast("int")),
                lambda o: F.coalesce(
                    F.element_at("__m", F.col("mn") + o), F.lit(0).cast("long")
                ),
            ).alias("s"),
        )
    )
    pa = series.select(F.col("t").alias("type_a"), F.col("s").alias("a"))
    pb = series.select(F.col("t").alias("type_b"), F.col("s").alias("b"))
    pairs = pa.join(F.broadcast(pb), F.col("type_a") < F.col("type_b")).select(
        "type_a",
        "type_b",
        "a",
        "b",
        F.size("a").cast("long").alias("n_a"),
        F.size("b").cast("long").alias("n_b"),
    )
    m = F.col("n_b")
    base = F.array(
        F.abs(F.element_at("a", 1) - F.element_at("b", 1)).cast("long")
    )

    def cell(acc, k):
        # cell index c = k (2..n*m), row-major: i=(c-1) div m + 1,
        # j=(c-1) mod m + 1; neighbors left=c-1, up=c-m, diag=c-m-1
        i = ((k - 1) / m).cast("long") + 1  # floor via long div on positives
        j = ((k - 1) % m) + 1
        cost = F.abs(
            F.element_at("a", i.cast("int")) - F.element_at("b", j.cast("int"))
        )
        left = F.element_at(acc, (k - 1).cast("int"))
        up = F.element_at(acc, (k - m).cast("int"))
        diag = F.element_at(acc, (k - m - 1).cast("int"))
        prev = (
            F.when((i == 1), left)
            .when((j == 1), up)
            .otherwise(F.least(left, up, diag))
        )
        return F.concat(acc, F.array((cost + prev).cast("long")))

    nm = (F.col("n_a") * F.col("n_b")).cast("long")
    dp = F.when(
        nm >= 2,
        F.aggregate(
            F.sequence(F.lit(2).cast("long"), nm),
            base,
            cell,
        ),
    ).otherwise(base)
    # guard lives INSIDE the output expression so column pruning can
    # never optimize it away; fires per-pair with the offending names
    guarded = F.when(
        nm <= F.lit(max_cells),
        F.element_at(dp, nm.cast("int")),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "dtw_distance: DP size n_a*n_b=%s exceeds max_cells=%s "
                "for pair (%s, %s); coarsen the series bucketing or "
                "raise max_cells explicitly",
                nm,
                F.lit(max_cells).cast("long"),
                F.col("type_a").cast("string"),
                F.col("type_b").cast("string"),
            )
        ).cast("long")
    )
    return pairs.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        guarded.alias("dtw"),
    )


def cross_corr_lag(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """Lagged cross-correlation between every pair of groups' daily
    series (round 6): Pearson r of (a_t, b_{t+lag}) for lag ∈
    [−max_lag, max_lag] — the lead/lag readout next to X92's DTW
    (DTW says "these move alike under warping", this names the fixed
    shift and its sign) and X47's autocorrelation (same moment
    algebra, two series instead of one).

    Exactness: both series live on the GLOBAL day grid (0-filled), so
    every lag's overlap sums are plain integer aggregates
    (n, Σx, Σy, Σx², Σy², Σxy); r = (nΣxy − ΣxΣy) /
    √((nΣx²−(Σx)²)(nΣy²−(Σy)²)) is one IEEE-exact double expression
    on those integers, rounded to 6 dp — identical in any engine.
    Zero-variance sides yield NULL r.

    Scale shape: the grid is |groups|×|days| (report-sized); the lag
    fan-out is a 2·max_lag+1 literal explode and the pair join is a
    day-equality join on that small grid — never event-sized. The
    only corpus-scan is the daily rollup (map-side combined).

    Returns (type_a, type_b, lag, n, r) for type_a < type_b.
    """
    daily = (
        events.where(F.col(group_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(group_col).alias("t"),
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
            .cast("long")
            .alias("d"),
        )
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    bounds = daily.agg(
        F.min("d").alias("__mn"), F.max("d").alias("__mx")
    )
    types = daily.select("t").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "t",
            F.explode(
                F.sequence(F.col("__mn"), F.col("__mx"))
            ).alias("d"),
        )
        .join(daily, ["t", "d"], "left")
        .select("t", "d", F.coalesce("c", F.lit(0).cast("long")).alias("c"))
    )
    lags = F.explode(
        F.sequence(F.lit(-max_lag), F.lit(max_lag))
    ).alias("lag")
    a = grid.select(
        F.col("t").alias("type_a"), F.col("d").alias("da"), F.col("c").alias("x")
    ).select("type_a", "da", "x", lags)
    b = grid.select(
        F.col("t").alias("type_b"), F.col("d").alias("db"), F.col("c").alias("y")
    )
    sums = (
        a.join(
            b,
            (F.col("type_b") > F.col("type_a"))
            & (F.col("db") == F.col("da") + F.col("lag")),
        )
        .groupBy("type_a", "type_b", "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
    )
    # moments go to double BEFORE the products: n*sxx and sx*sx stay
    # exact here (fixture magnitudes < 2^53) but would overflow BIGINT
    # on billion-event days; IEEE multiply is identical in any engine
    # either way, so parity is unaffected by the widening
    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx_d, syy_d = F.col("sxx").cast("double"), F.col("syy").cast("double")
    num = n_d * F.col("sxy").cast("double") - sx_d * sy_d
    vx = n_d * sxx_d - sx_d * sx_d
    vy = n_d * syy_d - sy_d * sy_d
    r = F.when(
        (vx > 0) & (vy > 0),
        F.round(num / F.sqrt(vx * vy), 6),
    ).otherwise(F.lit(None).cast("double"))
    return sums.select(
        "type_a", "type_b", F.col("lag").cast("long").alias("lag"), "n", r.alias("r")
    )


def nelson_aalen(
    events: DataFrame,
    unit_col: str = "user_id",
    ts_col: str = "ts",
    censor_horizon_days: int = 7,
) -> DataFrame:
    """Nelson-Aalen cumulative hazard (round 6) — the non-parametric
    hazard companion to X46's Kaplan-Meier survival curve, over the
    SAME unit lifetimes and censoring convention (first-to-last
    activity days; still-active-near-corpus-end = right-censored):

      H(t) = Σ_{t_i ≤ t} d_i / n_i,   Var ≈ Σ_{t_i ≤ t} d_i / n_i²

    KM answers "what fraction survives to t"; Nelson-Aalen reads the
    instantaneous churn pressure and is the better-behaved estimator
    under heavy ties — reporting both from one pass is standard.

    Scale shape is X46's exactly: ONE groupBy(unit), a broadcast 1-row
    horizon, then cumulative windows over the ≤|window-days| duration
    rows (non-foldable constant partition key). d and n are exact
    integers; each d/n term is one IEEE division and the cumulative
    sums round to 6 dp.

    Output: (duration_days, n_risk, n_events, n_censored, cum_hazard,
    hazard_var).
    """
    per_unit = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.min(F.to_date(ts_col)).alias("d0"),
        F.max(F.to_date(ts_col)).alias("d1"),
    )
    horizon = per_unit.agg(F.max("d1").alias("dmax"))
    lifet = per_unit.crossJoin(F.broadcast(horizon)).select(
        F.datediff("d1", "d0").cast("long").alias("duration_days"),
        (F.col("d1") <= F.date_sub(F.col("dmax"), censor_horizon_days))
        .cast("long")
        .alias("observed"),
    )
    per_dur = lifet.groupBy("duration_days").agg(
        F.sum("observed").alias("n_events"),
        F.sum(F.lit(1) - F.col("observed")).alias("n_censored"),
    )
    wall = Window.partitionBy(F.col("duration_days") % 1).orderBy("duration_days")
    wcum = wall.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wprev = wall.rowsBetween(Window.unboundedPreceding, -1)
    wtot = Window.partitionBy(F.col("duration_days") % 1)
    cum = per_dur.select(
        "duration_days",
        "n_events",
        "n_censored",
        (
            F.sum(F.col("n_events") + F.col("n_censored")).over(wtot)
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(wprev),
                F.lit(0),
            )
        ).alias("n_risk"),
    )
    d = F.col("n_events").cast("double")
    n = F.col("n_risk").cast("double")
    return cum.select(
        "duration_days",
        "n_risk",
        "n_events",
        "n_censored",
        F.round(F.sum(d / n).over(wcum), 6).alias("cum_hazard"),
        F.round(F.sum(d / (n * n)).over(wcum), 6).alias("hazard_var"),
    )


def seasonal_decompose(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Additive weekly decomposition of each group's daily-count series
    (round 6): y = trend + seasonal + residual — the classical-
    decomposition step above X47's seasonal_profile (that reports raw
    day-of-week means; this removes the trend first, so a growing
    series doesn't masquerade as seasonality) and the input CUSUM/
    changepoint monitors want deseasonalized.

    Exact integer algebra: series on the per-group 0-filled day grid;
    trend = centered 7-day moving mean in milli ((1000·Σ) div 7 —
    non-negative, truncating div == floor), defined only where the
    full window exists; seasonal(dow) = floor-mean of the detrended
    milli values per (group, epoch-day mod 7) — floor(double-div) on
    exact integers, engine-identical since the quotient's distance
    from any integer is ≥ 1/n ≫ ulp; residual = detrended − seasonal.

    Scale shape: one daily rollup (map-side combined), the grid join,
    one rows-window per group, one (group, dow) aggregate broadcast
    back — all |groups|×|days|-sized.

    Returns (event_type, day, y, trend_milli, seasonal_milli,
    residual_milli) for days where the trend window is complete.
    """
    daily = (
        events.where(F.col(group_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(group_col).alias("t"),
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
            .cast("long")
            .alias("d"),
        )
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    bounds = daily.groupBy("t").agg(
        F.min("d").alias("__mn"), F.max("d").alias("__mx")
    )
    grid = (
        bounds.select(
            "t", F.explode(F.sequence(F.col("__mn"), F.col("__mx"))).alias("d")
        )
        .join(daily, ["t", "d"], "left")
        .select("t", "d", F.coalesce("c", F.lit(0).cast("long")).alias("y"))
    )
    w7 = Window.partitionBy("t").orderBy("d").rowsBetween(-3, 3)
    with_trend = (
        grid.withColumn("__s7", F.sum("y").over(w7).cast("long"))
        .withColumn("__n7", F.count(F.lit(1)).over(w7).cast("long"))
        .where(F.col("__n7") == 7)
        .select(
            "t",
            "d",
            "y",
            F.expr("(1000 * __s7) div 7").cast("long").alias("trend_milli"),
        )
        .withColumn("det_milli", (1000 * F.col("y") - F.col("trend_milli")).cast("long"))
        .withColumn("dow", (F.col("d") % 7).cast("long"))
    )
    seasonal = with_trend.groupBy("t", "dow").agg(
        F.floor(
            F.sum("det_milli").cast("double") / F.count(F.lit(1)).cast("double")
        )
        .cast("long")
        .alias("seasonal_milli")
    )
    epoch = F.lit("1970-01-01").cast("date")
    return (
        with_trend.join(F.broadcast(seasonal), ["t", "dow"])
        .select(
            F.col("t").alias("event_type"),
            F.date_format(F.date_add(epoch, F.col("d").cast("int")), "yyyy-MM-dd").alias(
                "day"
            ),
            "y",
            "trend_milli",
            "seasonal_milli",
            (F.col("det_milli") - F.col("seasonal_milli")).cast("long").alias(
                "residual_milli"
            ),
        )
    )


def mann_kendall(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Mann–Kendall trend test per group over the 0-filled daily count
    grid (round 7) — the standard NONPARAMETRIC "is this metric
    monotonically trending?" test (Mann 1945, Kendall 1975): S =
    Σ_{i<j} sign(y_j − y_i) needs no linearity or distribution
    assumption, the rank-based complement to theilsen_trend's slope
    (X54 gives the magnitude, this gives the significance).

    Exact integers everywhere except the final z: S by definition, the
    tie-corrected variance as VAR·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)
    (t = size of each tied-value group), z = (S∓1)/√(var18/18) rounded
    to 6 dp (0 when S=0 or var=0).

    Scale shape: one map-side-combined daily rollup, then the i<j pair
    fan-out as a per-group equi-join on the |days|-row grid — |days|²
    JOIN ROWS per group (flowing through a shuffle join, never an
    array in memory), bounded by the date range like dtw/cross_corr;
    tie groups via a second tiny (group, value) count.

    Returns (event_type, n_days, s_stat, var_x18, z_score).
    """
    daily = (
        events.where(F.col(group_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(group_col).alias("t"),
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
            .cast("long")
            .alias("d"),
        )
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    grid = (
        daily.groupBy("t")
        .agg(F.min("d").alias("__mn"), F.max("d").alias("__mx"))
        .select("t", F.explode(F.sequence(F.col("__mn"), F.col("__mx"))).alias("d"))
        .join(daily, ["t", "d"], "left")
        .select("t", "d", F.coalesce("c", F.lit(0).cast("long")).alias("y"))
    )
    a, b = grid.alias("a"), grid.alias("b")
    s = (
        a.join(b, [F.col("a.t") == F.col("b.t"), F.col("a.d") < F.col("b.d")])
        .groupBy(F.col("a.t").alias("t"))
        .agg(
            F.sum(F.signum(F.col("b.y") - F.col("a.y")).cast("long"))
            .cast("long")
            .alias("s")
        )
    )
    ties = (
        grid.groupBy("t", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("tt"))
        .groupBy("t")
        .agg(
            F.sum(
                F.col("tt") * (F.col("tt") - 1) * (2 * F.col("tt") + 5)
            )
            .cast("long")
            .alias("tie_term"),
        )
    )
    nn = grid.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n"))
    m = (
        nn.join(s, "t")
        .join(ties, "t")
        .select(
            "t",
            "n",
            "s",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie_term")
            ).alias("var_x18"),
        )
    )
    var_d = F.col("var_x18").cast("double") / 18.0
    z = (
        F.when((F.col("s") == 0) | (F.col("var_x18") <= 0), F.lit(0.0))
        .when(F.col("s") > 0, (F.col("s").cast("double") - 1.0) / F.sqrt(var_d))
        .otherwise((F.col("s").cast("double") + 1.0) / F.sqrt(var_d))
    )
    return m.where(F.col("n") >= 2).select(
        F.col("t").alias("event_type"),
        F.col("n").alias("n_days"),
        F.col("s").alias("s_stat"),
        "var_x18",
        F.round(z, 6).alias("z_score"),
    )


def acf_daily(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """Autocorrelation function per group's own daily series (round 7):
    Pearson r of (y_t, y_{t+lag}) for lag ∈ [1, max_lag] on the
    0-filled PER-GROUP day grid — the seasonality detector X94's
    CROSS-correlation deliberately excludes (its pair join is
    type_a < type_b): a spike at lag 7 is the weekly cycle
    seasonal_decompose (X98) then removes, and the lag-1 value is the
    serial dependence that decides X100's Poisson-vs-bursty question
    quantitatively.

    Same exact-moment algebra as cross_corr_lag: overlap sums
    (n, Σx, Σy, Σx², Σy², Σxy) are plain integer aggregates on the
    grid self-join, one IEEE r expression on top rounded to 6 dp,
    NULL where a side is constant. Grid is per-group [first, last]
    (its own range — an ACF against days the group never lived is
    noise), lag fan-out is a literal explode, the join is day-equality
    on the report-sized grid. Returns (event_type, lag, n, r).
    """
    daily = (
        events.where(F.col(group_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(group_col).alias("t"),
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
            .cast("long")
            .alias("d"),
        )
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    grid = (
        daily.groupBy("t")
        .agg(F.min("d").alias("__mn"), F.max("d").alias("__mx"))
        .select("t", F.explode(F.sequence(F.col("__mn"), F.col("__mx"))).alias("d"))
        .join(daily, ["t", "d"], "left")
        .select("t", "d", F.coalesce("c", F.lit(0).cast("long")).alias("c"))
    )
    lags = F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    a = grid.select(
        F.col("t").alias("ta"), F.col("d").alias("da"), F.col("c").alias("x")
    ).select("ta", "da", "x", lags)
    b = grid.select(
        F.col("t").alias("tb"), F.col("d").alias("db"), F.col("c").alias("y")
    )
    sums = (
        a.join(
            b,
            (F.col("tb") == F.col("ta"))
            & (F.col("db") == F.col("da") + F.col("lag")),
        )
        .groupBy("ta", "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
    )
    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n_d * F.col("sxy").cast("double") - sx_d * sy_d
    vx = n_d * F.col("sxx").cast("double") - sx_d * sx_d
    vy = n_d * F.col("syy").cast("double") - sy_d * sy_d
    r = F.when(
        (vx > 0) & (vy > 0), F.round(num / F.sqrt(vx * vy), 6)
    ).otherwise(F.lit(None).cast("double"))
    return sums.select(
        F.col("ta").alias("event_type"),
        F.col("lag").cast("long").alias("lag"),
        "n",
        r.alias("r"),
    )


def logrank_test(
    events: DataFrame,
    unit_col: str = "user_id",
    ts_col: str = "ts",
    censor_horizon_days: int = 7,
) -> DataFrame:
    """Two-arm log-rank test on unit lifetimes (round 8, Mantel 1966):
    the inferential closer for the survival family — X56's
    Kaplan–Meier DRAWS the two retention curves, this says whether the
    md5 hash arms' curves differ beyond chance. Same lifetime and
    right-censoring conventions as kaplan_meier (days from first to
    last activity; still-active-near-corpus-end = censored), same
    deterministic first-hex-char arms as X45/X89.

    Exact integers into one double chain: per distinct duration t the
    at-risk counts n_t, n_at and event counts d_t, d_at are exact
    longs (cumulative windows over the per-duration aggregate);
    O−E = Σ(d_at − d_t·n_at/n_t) and the hypergeometric variance
    V = Σ d_t·(n_at/n_t)·(1−n_at/n_t)·(n_t−d_t)/(n_t−1) (terms with
    n_t ≤ 1 contribute 0) are sums over ≤ window-days rows, rounded
    6 dp; chi2 = (O−E)²/V with a V>0 guard.

    Scale shape: one groupBy(unit), a 1-row horizon broadcast, then
    everything runs on the tiny per-duration frame (the kaplan_meier
    shape with an arm split). Returns one row
    (n_a, n_b, events_a, events_b, o_minus_e, variance, chi2).
    """
    arm_a = (
        F.substring(F.md5(F.col("u").cast("string")), 1, 1) < F.lit("8")
    )
    per_unit = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.min(F.to_date(ts_col)).alias("d0"),
        F.max(F.to_date(ts_col)).alias("d1"),
    )
    horizon = per_unit.agg(F.max("d1").alias("dmax"))
    lifet = per_unit.crossJoin(F.broadcast(horizon)).select(
        F.datediff("d1", "d0").cast("long").alias("t"),
        (F.col("d1") <= F.date_sub(F.col("dmax"), censor_horizon_days))
        .cast("long")
        .alias("observed"),
        arm_a.cast("long").alias("is_a"),
    )
    per_dur = lifet.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("is_a").cast("long").alias("ma"),
        F.sum("observed").cast("long").alias("d"),
        F.sum(F.col("observed") * F.col("is_a")).cast("long").alias("da"),
    )
    wall = Window.partitionBy(F.col("t") % 1).orderBy("t")
    wprev = wall.rowsBetween(Window.unboundedPreceding, -1)
    wtot = Window.partitionBy(F.col("t") % 1)
    cum = per_dur.select(
        "t",
        "d",
        "da",
        (
            F.sum("m").over(wtot)
            - F.coalesce(F.sum("m").over(wprev), F.lit(0))
        ).cast("long").alias("n"),
        (
            F.sum("ma").over(wtot)
            - F.coalesce(F.sum("ma").over(wprev), F.lit(0))
        ).cast("long").alias("na"),
    )
    nd, nad = F.col("n").cast("double"), F.col("na").cast("double")
    dd = F.col("d").cast("double")
    e_term = dd * nad / nd
    v_term = F.when(
        F.col("n") > 1,
        dd
        * (nad / nd)
        * (1.0 - nad / nd)
        * (nd - dd)
        / (nd - 1.0),
    ).otherwise(F.lit(0.0))
    totals = lifet.agg(
        F.sum("is_a").cast("long").alias("n_a"),
        (F.count(F.lit(1)) - F.sum("is_a")).cast("long").alias("n_b"),
        F.sum(F.col("observed") * F.col("is_a")).cast("long").alias("events_a"),
        (F.sum("observed") - F.sum(F.col("observed") * F.col("is_a")))
        .cast("long")
        .alias("events_b"),
    )
    ome = cum.agg(
        F.sum(F.col("da").cast("double") - e_term).alias("__ome"),
        F.sum(v_term).alias("__v"),
    )
    joined = totals.crossJoin(F.broadcast(ome))
    chi2 = F.when(
        F.col("__v") > 0,
        F.col("__ome") * F.col("__ome") / F.col("__v"),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "n_a",
        "n_b",
        "events_a",
        "events_b",
        F.round(F.col("__ome"), 6).alias("o_minus_e"),
        F.round(F.col("__v"), 6).alias("variance"),
        F.round(chi2, 6).alias("chi2"),
    )

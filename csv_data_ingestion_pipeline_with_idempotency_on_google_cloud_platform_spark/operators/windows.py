"""Event-time analytics over the `events` table — extension X6.

Tumbling windows via `F.window` (the same expression drives the
Structured Streaming path with `withWatermark`; see streaming/). Sums
are computed in DECIMAL so the result is exact and engine-independent,
then cast back to double for a stable comparison surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Per (hour-window, event_type): event count and exact value sum."""
    return (
        events.groupBy(
            F.window("ts", duration).alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(events: DataFrame, duration: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Sliding windows — each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", exact_micros: bool = False
) -> DataFrame:
    """Per-user session windows (gap-based); batch equivalent of the
    streaming session_window operator.

    ``exact_micros=True`` emits the value sum as integer micro-units
    (decimal-summed, ×1e6) instead of a double — Spark's decimal→double
    conversion is not always correctly rounded (observed one-ulp-low vs
    DuckDB on e.g. 83.180000), so the oracle-compared surface stays in
    exact integer space.
    """
    sum_val = (
        (F.sum(F.col("value").cast("decimal(18,6)")) * 1000000)
        .cast("long")
        .alias("sum_value_micros")
        if exact_micros
        else F.sum("value").alias("sum_value")
    )
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), sum_val)
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            F.col("sum_value_micros" if exact_micros else "sum_value"),
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: per step, how many users reached it IN ORDER
    (each step's event strictly at-or-after the previous step's
    earliest qualifying time) — the sequential-pattern query Spark has
    no MATCH_RECOGNIZE for.

    Formulation: one groupBy(user) collecting each step's event times
    into per-user arrays (bounded by events-per-user, the natural
    sessionized scale), then the step times resolve as a left-to-right
    fold of array_min(filter(times, t >= prev)) — pure expressions, no
    self-joins, no window over the whole table. One shuffle on user.
    """
    typed = events.filter(F.col(type_col).isin(steps))
    aggs = [
        F.sort_array(
            F.collect_list(F.when(F.col(type_col) == s, F.col(ts_col)))
        ).alias(f"__ts_{i}")
        for i, s in enumerate(steps)
    ]
    per_user = typed.groupBy(user_col).agg(*aggs)

    reach_flags = []
    prev = None
    for i in range(len(steps)):
        arr = F.col(f"__ts_{i}")
        if prev is None:
            t = F.array_min(arr)
        else:
            t = F.array_min(F.filter(arr, lambda x: x >= prev))
        reach_flags.append(t.isNotNull().cast("long").alias(f"__r_{i}"))
        prev = t
    flags = per_user.select(*reach_flags)
    counts = (
        flags.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(i + 1).alias("step"),
                        F.col(f"__r_{i}").alias("__r"),
                    )
                    for i in range(len(steps))
                ])
            ).alias("s")
        )
        .groupBy(F.col("s.step").alias("step"))
        .agg(F.sum("s.__r").cast("bigint").alias("__n"))
    )
    # one row per requested step even when NO user has any step event —
    # left join from the literal step list, zero-filled
    steps_df = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, event_type string"
    )
    return steps_df.join(counts, "step", "left").select(
        "step",
        "event_type",
        F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_users"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity period
    (cohort), counted in each later period they were active —
    (cohort_start, period_offset, n_users).

    Two keyed aggregations, both on user/cohort keys: first-activity
    per user (map-side-combined min), then distinct users per
    (cohort, offset) cell. The first-activity table joins back keyed
    on user — same shuffle key as the groupBy before it, so Catalyst
    reuses the partitioning; no windows over the whole table.
    """
    day = F.col(ts_col).cast("timestamp").cast("date")
    ev = events.select(F.col(user_col).alias("u"), day.alias("d")).distinct()
    firsts = ev.groupBy("u").agg(F.min("d").alias("first_d"))
    bucket = lambda c: F.floor(F.datediff(c, F.lit("1970-01-01")) / bucket_days)
    return (
        ev.join(firsts, "u")
        .select(
            "u",
            (bucket(F.col("first_d")) * bucket_days).alias("__cb"),
            (bucket(F.col("d")) - bucket(F.col("first_d"))).alias("period_offset"),
        )
        .distinct()
        .groupBy("__cb", "period_offset")
        .agg(F.count_distinct("u").cast("bigint").alias("n_users"))
        .select(
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("__cb").cast("int")),
                "yyyy-MM-dd",
            ).alias("cohort_start"),
            F.col("period_offset").cast("bigint").alias("period_offset"),
            "n_users",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign a per-user session index to every event: a new session
    starts when the gap to the previous event exceeds `gap_minutes` —
    the row-level complement of session_window_agg (which aggregates
    whole sessions away).

    One window over (user, ts): lag for the gap, running sum of
    session-start flags for the index. Keyed by user, so partition
    state is bounded by events-per-user; no global sort.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    ts = F.col(ts_col).cast("timestamp")
    prev = F.lag(ts).over(w)
    new_session = (
        prev.isNull()
        | (F.unix_micros(ts) - F.unix_micros(prev) > gap_minutes * 60_000_000)
    ).cast("long")
    return events.withColumn(
        "session_idx",
        F.sum(new_session).over(
            Window.partitionBy(user_col)
            .orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def rolling_user_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    trailing_rows: int = 3,
    trailing_micros: int = 3_600_000_000,
) -> DataFrame:
    """Per-event rolling features — the time-series feature-engineering
    shape (fraud scores, rate limits, session heat): for every event,
    aggregates over that user's trailing window, both row-based (last
    `trailing_rows` PRIOR events — excludes the current row, so the
    feature is leakage-free for training) and time-based (everything in
    the past `trailing_micros`, inclusive).

    One shuffle on the user key serves all four features; the
    time-range frame orders by epoch micros (a numeric RANGE frame —
    Spark cannot range over timestamps directly). Partition state is
    bounded by events-per-user, never the table.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.withColumn("__us", us)
    # ROWS frames need a total order: a bare __us ordering makes
    # prev_n/prev_sum nondeterministic when two events of one user
    # share a microsecond, so event_id breaks ties (the RANGE frame is
    # tie-safe by construction — peers are always included)
    w_rows = (
        Window.partitionBy(user_col)
        .orderBy("__us", "event_id")
        .rowsBetween(-trailing_rows, -1)
    )
    w_range = (
        Window.partitionBy(user_col)
        .orderBy("__us")
        .rangeBetween(-trailing_micros, 0)
    )
    v = F.col(value_col).cast("decimal(18,6)")
    return base.select(
        "event_id",
        user_col,
        ts_col,
        F.count(v).over(w_rows).cast("bigint").alias("prev_n"),
        F.sum(v).over(w_rows).cast("double").alias("prev_sum"),
        F.count(v).over(w_range).cast("bigint").alias("hour_n"),
        F.sum(v).over(w_range).cast("double").alias("hour_sum"),
    )


def user_value_trend(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user OLS trend of event value over time — the behavioral-
    drift feature (is this user's spend/engagement rising?) computed
    as closed-form regression sums, no UDF and ONE shuffle.

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), with x = whole seconds
    since the user's first event (a window over the same user
    partitioning the aggregation uses — no second shuffle) and y the
    value in DECIMAL(18,6). Flooring x to seconds keeps every product
    inside DECIMAL range, so all five sums are EXACT and the oracle
    comparison carries no accumulation-order drift — the one float op
    is the final division. Users with fewer than 2 events or zero
    time variance are excluded (slope undefined).

    Returns (user_id, n_events, slope_per_hour) rounded to 6 dp.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col)
    base = events.select(
        F.col(user_col),
        F.col(value_col).cast("decimal(18,6)").alias("__y"),
        us.alias("__us"),
    ).withColumn(
        "__x", F.floor((F.col("__us") - F.min("__us").over(w)) / 1_000_000)
    )
    sums = base.groupBy(user_col).agg(
        F.count("*").alias("n_events"),
        F.sum("__x").alias("sx"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    den = sums["n_events"] * F.col("sxx") - F.col("sx") * F.col("sx")
    num = sums["n_events"] * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        sums.filter((F.col("n_events") >= 2) & (den > 0))
        .select(
            user_col,
            "n_events",
            F.round(
                (num.cast("double") / den.cast("double")) * 3600.0, 6
            ).alias("slope_per_hour"),
        )
    )


def theilsen_trend(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    max_events: int = 200,
) -> DataFrame:
    """Per-user Theil-Sen trend — the robust twin of
    ``user_value_trend``: the median of all pairwise slopes
    (y_b − y_a)/(x_b − x_a), which a single outlier event cannot move
    (OLS breaks down at one bad point; Theil-Sen tolerates ~29%).

    x is whole seconds since the user's first event (window over the
    same user partitioning the join uses). Pairs come from a per-user
    self-join — O(n²) per user, which is why `max_events` is a HARD
    cap applied before the join: at 100 TB a hot user (bot traffic)
    would otherwise quadratically dominate one task, so users past the
    cap are excluded (deterministically, so the DuckDB oracle can
    state the same rule). With the cap, pair volume per user is ≤
    max_events²/2 and the only shuffle is the user-key join.

    Every slope is one IEEE double division of exact inputs (double y
    straight from storage, bigint Δx), and the median interpolates the
    two middle values as lo + (hi − lo)·0.5 — the exact-percentile
    interpolation both Spark's `median` and DuckDB's `median` apply —
    so the oracle comparison carries no accumulation-order drift.
    Equal-timestamp pairs (Δx = 0) are excluded on both sides.

    The median itself is RANK-BASED (row_number window at ranks
    ⌊(n+1)/2⌋ and ⌊(n+2)/2⌋), not `F.median`: the exact-percentile
    aggregate buffers every slope per group in an ObjectHashAggregate,
    measured 4.5 s at sf0.1 vs 3.0 s for the sort-window form on the
    same 3.3M pairs — and a sort-window spills gracefully where a
    per-group buffer OOMs on a hot user at 100 TB.

    Returns (user_id, n_events, n_pairs, slope_per_hour) rounded 6 dp.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col)
    # explicit user-key repartition at cluster parallelism (r9): the
    # pair stage downstream is compute-dense but byte-light, and AQE's
    # byte-based coalescing was folding the window exchange to ONE
    # post-shuffle partition at bench scale — serializing the O(n²/user)
    # slope work on a single core (measured 6 tasks total / 3.0 s).
    # An explicit numPartitions is exempt from AQE coalescing; the
    # window, the self-join (ReusedExchange) and the rank window all
    # inherit this partitioning, so no extra exchange is added.
    n_part = events.sparkSession.sparkContext.defaultParallelism
    base = (
        events.filter(
            F.col(user_col).isNotNull()
            & F.col(value_col).isNotNull()
            & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(user_col),
            F.col(value_col).cast("double").alias("__y"),
            us.alias("__us"),
        )
        .repartition(n_part, user_col)
        .withColumn(
            "__x", F.floor((F.col("__us") - F.min("__us").over(w)) / 1_000_000)
        )
        .withColumn("__n", F.count(F.lit(1)).over(w))
        .filter((F.col("__n") >= 2) & (F.col("__n") <= max_events))
        .select(user_col, "__n", "__x", "__y")
    )
    # self-join of the SAME windowed subtree (aliases, not re-derived
    # frames) so Catalyst reuses one shuffle/scan for both sides
    # (ReusedExchange) instead of computing the window twice
    a = base.alias("a")
    b = base.alias("b")
    slopes = (
        a.join(
            b,
            (F.col(f"a.{user_col}") == F.col(f"b.{user_col}"))
            & (F.col("a.__x") < F.col("b.__x")),
        )
        .select(
            F.col(f"a.{user_col}").alias(user_col),
            F.col("a.__n").alias("n_events"),
            (
                (F.col("b.__y") - F.col("a.__y"))
                / (F.col("b.__x") - F.col("a.__x")).cast("double")
            ).alias("slope"),
        )
    )
    ws = Window.partitionBy(user_col).orderBy("slope")
    wn = Window.partitionBy(user_col)
    ranked = slopes.withColumn("rk", F.row_number().over(ws)).withColumn(
        "np", F.count(F.lit(1)).over(wn)
    )
    return (
        ranked.groupBy(user_col)
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("np").cast("long").alias("n_pairs"),
            F.min(
                F.when(
                    F.col("rk") == F.expr("cast((np+1) div 2 as bigint)"),
                    F.col("slope"),
                )
            ).alias("__lo"),
            F.min(
                F.when(
                    F.col("rk") == F.expr("cast((np+2) div 2 as bigint)"),
                    F.col("slope"),
                )
            ).alias("__hi"),
        )
        .select(
            user_col,
            "n_events",
            "n_pairs",
            F.round(
                (F.col("__lo") + (F.col("__hi") - F.col("__lo")) * 0.5)
                * 3600.0,
                6,
            ).alias("slope_per_hour"),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the path-mining primitive behind "what do users do
    after X" questions and synthetic-sequence sanity checks on
    behavioral training data.

    One shuffle on the user key orders each user's history (event_id
    breaks timestamp ties, so the LAG is deterministic); the
    (prev, next) count is map-side combinable, and the row-probability
    normalization runs over the AGGREGATED matrix — |event types|²
    rows — so the second window is trivially small by construction.
    Counts are exact integers and the probability is a single IEEE
    division, so the oracle comparison carries no accumulation drift.

    Returns (prev_type, next_type, n, prob) where prob is the row-
    normalized transition probability, rounded to 6 dp.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    pairs = (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            "event_id",
            F.col(type_col).alias("next_type"),
        )
        .withColumn("prev_type", F.lag("next_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n")
    )
    w_row = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_row), 6).alias("prob"),
    )


def window_distinct_users(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Per tumbling window: event volume and EXACT distinct reach —
    the dashboard pair (hits, uniques) every event pipeline serves.

    Catalyst plans count(distinct) as a two-level aggregation — a
    (window, user) pre-aggregate then the final count — so the shuffle
    carries distinct pairs, not raw events, and both levels map-side
    combine. The approximate twin at corpus scale is `approx_distinct`
    (HLL++), which replaces the pre-aggregate with a mergeable sketch.
    """
    return (
        events.groupBy(F.window("ts", duration).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "n_users",
        )
    )


def rfm_segments(events: DataFrame, n_tiles: int = 4) -> DataFrame:
    """RFM (recency / frequency / monetary) user segmentation — the
    classic value-segmentation rollup: per user, the last-seen
    timestamp, event count, and value sum, each quartiled into
    1..n_tiles with 1 = best (most recent / most frequent / highest
    spend), plus the concatenated segment code ("111" = champions).

    Scale shape: ONE map-side-combined groupBy(user) carrying three
    partial aggregates, then — instead of three `ntile` windows,
    which would each drag every user row through a single partition —
    three range-partitioned global ranks (packing.assign_global_ids:
    per-partition counts become broadcast prefix offsets, no global
    sort) fed into ntile's closed form: with n users and t tiles, the
    first n % t tiles get ⌈n/t⌉ rows, the rest ⌊n/t⌋, exactly the
    SQL-standard split. Ordering keys are encoded as ascending
    (negated metric, user_id) structs so each rank is total and
    deterministic, and the monetary metric is ranked on its ROUNDED
    value so engines that sum doubles in different orders still rank
    identically. Driver state: three partition-count lists plus one
    1-row count — the same bounded class as the k-means partials.
    """
    from .packing import assign_global_ids

    per_user = events.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    keyed = per_user.select(
        "user_id",
        "n_events",
        "total_value",
        F.struct(
            # cast handles TIMESTAMP_NTZ inputs (the nanos-truncated
            # events source); any fixed-offset reinterpretation is
            # order-preserving, which is all the rank key needs
            (-F.unix_micros(F.col("last_ts").cast("timestamp"))).alias("k"),
            F.col("user_id").alias("u"),
        ).alias("__k_r"),
        F.struct(
            (-F.col("n_events")).alias("k"), F.col("user_id").alias("u")
        ).alias("__k_f"),
        F.struct(
            (-F.col("total_value")).alias("k"), F.col("user_id").alias("u")
        ).alias("__k_m"),
    )
    ranked = keyed
    for key, rank in (("__k_r", "__r_r"), ("__k_f", "__r_f"), ("__k_m", "__r_m")):
        ranked = assign_global_ids(ranked, key, id_col=rank)
    n = ranked.count()
    q, r = divmod(n, n_tiles)
    boundary = r * (q + 1)

    def tile(rank_col: str):
        i = F.col(rank_col)
        return (
            F.when(i < F.lit(boundary), F.floor(i / F.lit(q + 1)))
            .otherwise(
                F.lit(r) + F.floor((i - F.lit(boundary)) / F.lit(max(q, 1)))
            )
            + 1
        ).cast("long")

    return ranked.select(
        "user_id",
        "n_events",
        "total_value",
        tile("__r_r").alias("r_tile"),
        tile("__r_f").alias("f_tile"),
        tile("__r_m").alias("m_tile"),
        F.concat_ws(
            "", tile("__r_r"), tile("__r_f"), tile("__r_m")
        ).alias("segment"),
    )


def event_paths_topk(
    events: DataFrame, n: int = 3, k: int = 20
) -> DataFrame:
    """Sequential pattern mining: the k most common length-`n` event-type
    paths across users (e.g. "view > click > purchase") — the
    product-analytics primitive behind "what do users actually do",
    complementing the Markov `event_transitions` (order-1) with
    arbitrary-order paths.

    Shape: ONE shuffle keyed by user collects each user's ordered type
    sequence (per-user arrays are bounded by per-user activity, the
    same bound sessionize/funnel rely on); n-gram expansion is a narrow
    slice+concat fold (identical machinery to word_shingles_col); the
    path count map-side combines; top-k is orderBy+limit →
    TakeOrderedAndProject. Deterministic (ts, event_id) event order and
    (count desc, path asc) tie-break.
    """
    seqs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("es")
        )
        .select(F.transform("es", lambda e: e["event_type"]).alias("s"))
        .filter(F.size("s") >= n)
    )
    grams = seqs.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("s") - (n - 1)),
                lambda i: F.concat_ws(" > ", F.slice(F.col("s"), i, n)),
            )
        ).alias("path")
    )
    return (
        grams.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(k)
    )


def first_seen_distinct_rollup(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact cumulative distinct users per day WITHOUT re-counting —
    the classic rewrite that turns "COUNT(DISTINCT user) to date, for
    every day" (naively |days| dedups over ever-growing prefixes, a
    quadratic scan at 100 TB) into: each user's FIRST day (one
    map-side-combined MIN groupBy), new-user counts per day, and a
    prefix sum over the |days|-row daily table. Also reports each
    day's active users and the returning share, the growth-accounting
    readout.

    Exact, not a sketch: this is the one distinct-over-time query with
    a lossless linear rewrite (monotone prefix windows); arbitrary
    window distinct needs X49's synopses.

    Returns (day, n_active, n_new, cum_distinct, returning_milli).
    """
    base = events.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(F.col(user_col).alias("u"), F.to_date(ts_col).alias("day"))
    first = base.groupBy("u").agg(F.min("day").alias("first_day"))
    new_per_day = first.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    active = base.distinct().groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    joined = active.join(new_per_day, "day", "left").withColumn(
        "n_new", F.coalesce("n_new", F.lit(0).cast("long"))
    )
    w = (
        Window.partitionBy(F.col("day").isNotNull())
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_active",
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cum_distinct"),
        F.expr("(1000 * (n_active - n_new)) div n_active").alias(
            "returning_milli"
        ),
    )


def funnel_time_percentiles(
    events: DataFrame,
    step_a: str,
    step_b: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Conversion-latency distribution for one funnel edge: per user,
    the earliest ``step_a`` and the earliest ``step_b`` at-or-after it,
    then exact interpolated quantiles of the gap — funnel_counts says
    how many convert, this says how long conversion takes (the number
    an SLA or an abandonment analysis actually needs).

    Same one-shuffle shape as funnel_counts: groupBy(user) collects the
    step-B times as a bounded per-user array, the qualifying B resolves
    as array_min(filter(times, t >= ta)) — no self-join, no window.
    Gaps are exact integer MICROSECONDS (unix_micros both engines);
    `percentile` (sort-based, interpolated) matches DuckDB's
    quantile_cont — the percentile_value precedent. Output seconds,
    6 dp. Returns ONE row: (step_a, step_b, n_users, p25_s, p50_s,
    p75_s, p90_s).
    """
    typed = events.filter(F.col(type_col).isin([step_a, step_b]))
    per_user = typed.groupBy(user_col).agg(
        F.min(F.when(F.col(type_col) == step_a, F.col(ts_col))).alias("__ta"),
        F.sort_array(
            F.collect_list(F.when(F.col(type_col) == step_b, F.col(ts_col)))
        ).alias("__tbs"),
    )
    tb = F.array_min(F.filter("__tbs", lambda t: t >= F.col("__ta")))
    # NTZ -> TZ cast for unix_micros (session TZ pinned UTC); the
    # difference cancels any offset regardless
    gaps = (
        per_user.where(F.col("__ta").isNotNull())
        .select(
            (
                F.unix_micros(tb.cast("timestamp"))
                - F.unix_micros(F.col("__ta").cast("timestamp"))
            ).alias("d_us")
        )
        .where(F.col("d_us").isNotNull())
    )
    return gaps.agg(
        F.lit(step_a).alias("step_a"),
        F.lit(step_b).alias("step_b"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.expr("percentile(d_us, 0.25)") / 1000000.0, 6).alias("p25_s"),
        F.round(F.expr("percentile(d_us, 0.5)") / 1000000.0, 6).alias("p50_s"),
        F.round(F.expr("percentile(d_us, 0.75)") / 1000000.0, 6).alias("p75_s"),
        F.round(F.expr("percentile(d_us, 0.9)") / 1000000.0, 6).alias("p90_s"),
    )


def active_user_rollup(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    wau_days: int = 7,
    mau_days: int = 30,
) -> DataFrame:
    """DAU / WAU / MAU per day (round 6): exact trailing-window distinct
    users — the engagement headline every events product reports, and
    the canonical "COUNT(DISTINCT) over a sliding window" that plain
    window functions cannot express.

    Scale rewrite: never re-scan a 30-day window per day. Collapse
    events to distinct user-days (orders of magnitude smaller than
    events), fan each user-day out to the ``mau_days`` report days it
    can serve (offset explode), keep each user's MIN offset per report
    day, then one groupBy counts dau (min offset 0), wau (< wau_days),
    mau (all) without any COUNT(DISTINCT). Shuffles are user-day-sized:
    dedup, (day, user) min-offset combine, per-day rollup — each
    map-side combined. Report days past the last observed day are
    dropped via a broadcast 1-row max.

    Returns (day, dau, wau, mau), exact integers.
    """
    base = events.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).cast("long").alias("d"),
        F.col(user_col).alias("u"),
    )
    return rollup_user_days(base.distinct(), wau_days=wau_days, mau_days=mau_days)


def rollup_user_days(
    ud: DataFrame, wau_days: int = 7, mau_days: int = 30
) -> DataFrame:
    """DAU/WAU/MAU from a DISTINCT (d, u) user-day frame — the shared
    core of batch `active_user_rollup` and the streaming engagement
    twin's readout (streaming/engagement_stream.py), which feeds it
    the distinct()-ed user-day delta ledger. Same offset-explode /
    MIN-offset shape as documented on the batch operator."""
    mx = ud.agg(F.max("d").alias("__mxd"))
    contrib = ud.select(
        "u",
        "d",
        F.explode(F.sequence(F.lit(0), F.lit(mau_days - 1))).alias("off"),
    ).select((F.col("d") + F.col("off")).alias("td"), "u", "off")
    per_user = contrib.groupBy("td", "u").agg(F.min("off").alias("mo"))
    rolled = per_user.groupBy("td").agg(
        F.count(F.when(F.col("mo") == 0, F.lit(1))).cast("long").alias("dau"),
        F.count(F.when(F.col("mo") < wau_days, F.lit(1))).cast("long").alias("wau"),
        F.count(F.lit(1)).cast("long").alias("mau"),
    )
    epoch = F.lit("1970-01-01").cast("date")
    return (
        rolled.join(F.broadcast(mx))
        .where(F.col("td") <= F.col("__mxd"))
        .select(
            F.date_format(
                F.date_add(epoch, F.col("td").cast("int")), "yyyy-MM-dd"
            ).alias("day"),
            "dau",
            "wau",
            "mau",
        )
    )


def new_user_share(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-day new-vs-returning split of active users (round 7): DAU,
    how many of them are FIRST-EVER-SEEN that day, and the integer
    milli new-user share — the growth-vs-retention headline that sits
    one join away from X87's DAU/WAU/MAU (same user-day grain; a
    product where new_milli stays near 1000 is all acquisition and no
    retention, near 0 is saturated).

    Shape: the distinct user-day frame (the X87 primitive — the
    streaming engagement ledger computes exactly this incrementally),
    a per-user MIN-day aggregate (map-side combined, no window over
    events), one join back on (user, day), one per-day rollup. All
    exact integers. Returns (day, dau, n_new, new_milli).
    """
    ud = (
        events.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
            .cast("long")
            .alias("d"),
            F.col(user_col).alias("u"),
        )
        .distinct()
    )
    first = ud.groupBy("u").agg(F.min("d").alias("fd"))
    per_day = (
        ud.join(first, "u")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dau"),
            F.sum(F.when(F.col("d") == F.col("fd"), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
        )
    )
    epoch = F.lit("1970-01-01").cast("date")
    return per_day.select(
        F.date_format(F.date_add(epoch, F.col("d").cast("int")), "yyyy-MM-dd").alias(
            "day"
        ),
        "dau",
        "n_new",
        F.expr("(1000 * n_new) div dau").cast("long").alias("new_milli"),
    )


def activation_latency(
    events: DataFrame,
    nth: int = 5,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-to-Nth-event per user, summarized per event type (round
    8): for every user with ≥ nth events of a type, the latency from
    their FIRST to their Nth event of that type, reported as exact
    p50/p90 order statistics in whole seconds — the activation-speed
    readout product teams pair with X118's new-user share (how many
    users start vs how fast the starters reach the habit threshold).

    Exact: event order is the (ts, event_id) total order, latency is
    an integer micros difference floored to seconds, and percentiles
    are rank-⌈q·n⌉ order statistics — no interpolation. The per-user
    sequence rank partitions by (type, user) — a data-scaling key.
    The per-type percentile runs on TIE GROUPS (round-9 sweep: the
    value at rank ⌈q·n⌉ under (lat_s, u) order depends only on the
    lat_s cumulative counts, so a groupBy(t, lat_s) count + cumsum
    over the distinct-latency frame replaces the user-scale
    row_number window the r8 form serialized through one task per
    type — the trimmed_mean/event_freshness precedent). Returns
    (event_type, n_activated, p50_latency_s, p90_latency_s,
    max_latency_s).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.where(
        F.col(type_col).isNotNull()
        & F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(type_col).alias("t"),
        F.col(user_col).alias("u"),
        us.alias("__us"),
        F.col(id_col).cast("long").alias("rid"),
    )
    w = Window.partitionBy("t", "u").orderBy("__us", "rid")
    seq = base.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk").isin(1, nth)
    )
    lat = (
        seq.groupBy("t", "u")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__k"),
            F.min(F.when(F.col("rk") == 1, F.col("__us"))).alias("__first"),
            F.min(F.when(F.col("rk") == nth, F.col("__us"))).alias("__nth"),
        )
        .where(F.col("__nth").isNotNull())
        .select(
            "t",
            "u",
            F.floor(
                (F.col("__nth") - F.col("__first")) / 1_000_000
            ).cast("long").alias("lat_s"),
        )
    )
    cells = lat.groupBy("t", "lat_s").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    wg = Window.partitionBy("t").orderBy("lat_s")
    wt = Window.partitionBy("t")
    ranked = cells.withColumn("cum", F.sum("__c").over(wg)).withColumn(
        "n", F.sum("__c").over(wt)
    )
    # smallest latency whose cumulative count reaches rank ⌈q·n⌉ —
    # identical to the value at that rank under (lat_s, u) order
    pick = lambda q: F.min(  # noqa: E731 - tie-group order statistic
        F.when(
            F.col("cum") >= F.expr(f"cast(ceil({q} * n) as bigint)"),
            F.col("lat_s"),
        )
    )
    return (
        ranked.groupBy("t")
        .agg(
            F.max("n").cast("long").alias("n_activated"),
            pick(0.5).cast("long").alias("p50_latency_s"),
            pick(0.9).cast("long").alias("p90_latency_s"),
            F.max("lat_s").cast("long").alias("max_latency_s"),
        )
        .select(
            F.col("t").alias(type_col),
            "n_activated",
            "p50_latency_s",
            "p90_latency_s",
            "max_latency_s",
        )
    )

"""Data-quality tooling: table profiling and declarative constraint
checks — the ANALYZE / dbt-tests layer of a pipeline engine.

This generalizes the reference's V1 row-count validation
(``main.py:120-137``: count lines, mark done/failed) from one
hard-coded check to a reusable validation surface over any table.

Scale shape: profile_table is ONE aggregation pass over the table (a
single wide agg row, melted to per-column rows driver-side — |columns|
rows, not |rows|); each constraint check is one aggregation or one
anti-join, never a collect of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max as strings so one output schema
    covers every column type.

    One aggregation pass; n_distinct is exact (count_distinct) so the
    result is oracle-checkable — at 100 TB swap in
    approx_count_distinct (same API shape, documented trade, see
    `approx_distinct`).
    """
    from pyspark.sql.types import NumericType

    cols = columns or df.columns

    def _render(col_expr, c):
        # numeric min/max go through DECIMAL(38,6) so every engine
        # prints the same plain-decimal text — a raw double→string cast
        # switches to scientific notation outside ~[1e-3, 1e7) in the
        # JVM but never in DuckDB, silently breaking oracle parity
        if isinstance(df.schema[c].dataType, NumericType):
            return col_expr.cast("decimal(38,6)").cast("string")
        return col_expr.cast("string")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        aggs.append(_render(F.min(F.col(c)), c).alias(f"__min_{c}"))
        aggs.append(_render(F.max(F.col(c)), c).alias(f"__max_{c}"))
    # the k count_distincts Expand the input k+1-fold before the
    # partial agg — all map-side work that a single-file scan would run
    # on 1-2 cores (r9: spread first, no-op at real scale)
    from ..utils import parallelize_narrow

    wide = parallelize_narrow(df.select(*cols)).agg(*aggs)

    def _ident(name: str) -> str:
        # backtick-quote so column names with spaces/hyphens/quotes
        # survive the stack() SQL round-trip
        return "`" + name.replace("`", "``") + "`"

    def _label(name: str) -> str:
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack_args = []
    for c in cols:
        stack_args.append(_label(c))
        stack_args.append(_ident(f"__nulls_{c}"))
        stack_args.append(_ident(f"__nd_{c}"))
        stack_args.append(_ident(f"__min_{c}"))
        stack_args.append(_ident(f"__max_{c}"))
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) "
            "AS (column, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def check_unique(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """(constraint, n_violations): rows beyond the first per key."""
    dup = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)).alias("n_violations"))
    )
    name = "unique(" + ",".join(key_cols) + ")"
    return dup.select(F.lit(name).alias("constraint"), F.col("n_violations").cast("bigint"))


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    """(constraint, n_violations): NULLs in `col`."""
    return df.agg(
        F.lit(f"not_null({col})").alias("constraint"),
        F.sum(F.col(col).isNull().cast("long")).cast("bigint").alias("n_violations"),
    )


def check_references(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str, name: str
) -> DataFrame:
    """(constraint, n_violations): NON-NULL child keys with no parent —
    a LEFT ANTI join, the same plan family as the idempotency gate.
    No broadcast hint: the parent can be a fact table (billions of
    distinct keys), so the join strategy is left to the optimizer —
    AQE broadcasts at runtime when the distinct parent key set turns
    out small, and falls back to a shuffled anti-join when it is not.
    NULL child keys are not reference violations (SQL FK semantics);
    pair with check_not_null when NULLs should also fail."""
    orphans = (
        child.select(F.col(child_col))
        .filter(F.col(child_col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias(child_col))
            .filter(F.col(child_col).isNotNull())
            .distinct(),
            child_col,
            "left_anti",
        )
    )
    return orphans.agg(
        F.lit(name).alias("constraint"),
        F.count(F.lit(1)).cast("bigint").alias("n_violations"),
    )


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union the per-check single-row frames into one report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index per fixed-width bin — the standard
    train-vs-serve / week-over-week feature-drift monitor (PSI < 0.1
    stable, > 0.25 drifted).

    Bin edges are FIXED by (lo, hi, n_bins), not quantile-derived, so
    the two sides bin identically, re-runs are reproducible, and the
    whole computation is oracle-exact. Out-of-range values clamp into
    the edge bins. Probabilities are Laplace-smoothed
    ((count + 0.5) / (total + 0.5·n_bins)) so an empty bin on either
    side never produces ±inf.

    Scale shape: one narrow aggregation pass per side (map-side
    combined, ≤ n_bins rows out), a broadcast-sized full-outer join on
    bin id, and two 1-row count frames broadcast back. Nothing
    row-scale ever shuffles. Returns (bin, bin_lo, base_count,
    cur_count, psi_contrib) with Σ psi_contrib = the PSI.
    """
    width = (hi - lo) / n_bins

    def _binned(df: DataFrame, out: str) -> DataFrame:
        b = F.least(
            F.greatest(
                F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(0)
            ),
            F.lit(n_bins - 1),
        ).cast("int")
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(out)
        )

    bcnt = _binned(base, "base_count")
    ccnt = _binned(current, "cur_count")
    # all n_bins rows present even when empty on both sides: seed with
    # the literal bin range so the report schema is total and stable
    spark = base.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        bins.join(F.broadcast(bcnt), "bin", "left")
        .join(F.broadcast(ccnt), "bin", "left")
        .select(
            "bin",
            F.coalesce("base_count", F.lit(0)).alias("base_count"),
            F.coalesce("cur_count", F.lit(0)).alias("cur_count"),
        )
    )
    tb = base.agg(F.count(F.lit(1)).alias("__tb"))
    tc = current.agg(F.count(F.lit(1)).alias("__tc"))
    pb = (F.col("base_count") + 0.5) / (F.col("__tb") + 0.5 * n_bins)
    pc = (F.col("cur_count") + 0.5) / (F.col("__tc") + 0.5 * n_bins)
    return (
        joined.crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(tc))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
            "base_count",
            "cur_count",
            F.round((pc - pb) * F.log(pc / pb), 6).alias("psi_contrib"),
        )
        .orderBy("bin")
    )


def k_anonymity(
    df: DataFrame,
    qi_cols: list[str],
    k: int,
    sensitive_col: str | None = None,
) -> DataFrame:
    """k-anonymity (and optional l-diversity) audit over a set of
    quasi-identifier columns — the re-identification-risk gate run
    before a dataset export.

    Returns ONE summary row: (k, n_rows, n_groups, min_group_size,
    violating_groups, violating_rows[, min_l]) where a violating group
    is a quasi-identifier combination shared by fewer than k rows —
    each of its members is re-identifiable within a set smaller than
    k. With `sensitive_col`, min_l is the smallest number of distinct
    sensitive values in any group (l-diversity: a group can be k-large
    yet leak the sensitive value if all members share it).

    Scale shape: one map-side-combined groupBy over the
    quasi-identifiers (output is |distinct QI combos|, not |rows|)
    followed by a 1-row rollup; no joins, no windows, nothing
    collected.
    """
    per_group = [F.count(F.lit(1)).alias("__size")]
    if sensitive_col is not None:
        per_group.append(F.count_distinct(F.col(sensitive_col)).alias("__l"))
    groups = df.groupBy(*qi_cols).agg(*per_group)
    aggs = [
        F.lit(k).alias("k"),
        F.sum("__size").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("__size").cast("bigint").alias("min_group_size"),
        F.sum((F.col("__size") < k).cast("long")).cast("bigint").alias(
            "violating_groups"
        ),
        F.sum(F.when(F.col("__size") < k, F.col("__size")).otherwise(0))
        .cast("bigint")
        .alias("violating_rows"),
    ]
    if sensitive_col is not None:
        aggs.append(F.min("__l").cast("bigint").alias("min_l"))
    return groups.agg(*aggs)


def histogram_counts(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int = 10
) -> list[int]:
    """The fixed-width histogram of `col` as n_bins driver-side ints —
    the baseline artifact a streaming PSI monitor compares against
    (bounded driver state, like k-means centroids). Same clamped
    binning as psi_drift."""
    width = (hi - lo) / n_bins
    b = F.least(
        F.greatest(F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    rows = df.select(b.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("c")
    ).collect()
    counts = [0] * n_bins
    for r in rows:
        counts[r["bin"]] = r["c"]
    return counts


def mutual_information(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Mutual information (nats, milli-rounded) between two
    categorical columns, plus both marginal entropies — the
    feature-dependence screen (is `source` informative about `lang`?
    is a quasi-identifier leaking the sensitive column?).

    One map-side-combined groupBy builds the joint contingency table;
    marginals come from windows over that |A|·|B|-row aggregate (tiny
    relative to the data), and the final row is one sum over it. The
    float log terms sum over ≤|A|·|B| values before a milli rounding —
    far inside float reproducibility; all counts stay exact BIGINT.
    """
    joint = df.groupBy(col_a, col_b).agg(F.count("*").alias("c_ab"))
    w_a = Window.partitionBy(col_a)
    w_b = Window.partitionBy(col_b)
    w_all = Window.partitionBy(F.col("c_ab") % 1)
    with_m = joint.select(
        "c_ab",
        F.sum("c_ab").over(w_a).alias("c_a"),
        F.sum("c_ab").over(w_b).alias("c_b"),
        F.sum("c_ab").over(w_all).alias("n"),
    )
    # MI from the joint cells; entropies accumulate the same cells
    # weighted by the joint mass (Σ_b c_ab/n · ln(n/c_a) = H(A))
    terms = with_m.select(
        "n",
        (
            (F.col("c_ab") / F.col("n"))
            * F.log(
                F.col("n").cast("double")
                * F.col("c_ab")
                / (F.col("c_a") * F.col("c_b"))
            )
        ).alias("mi_term"),
        ((F.col("c_ab") / F.col("n")) * F.log(F.col("n") / F.col("c_a"))).alias(
            "ha_term"
        ),
        ((F.col("c_ab") / F.col("n")) * F.log(F.col("n") / F.col("c_b"))).alias(
            "hb_term"
        ),
    )
    return terms.groupBy("n").agg(
        F.round(1000 * F.sum("mi_term")).cast("long").alias("mi_milli"),
        F.round(1000 * F.sum("ha_term")).cast("long").alias("h_a_milli"),
        F.round(1000 * F.sum("hb_term")).cast("long").alias("h_b_milli"),
    ).select(
        F.col("n").cast("long").alias("n_rows"),
        "mi_milli",
        "h_a_milli",
        "h_b_milli",
    )


def skyline_pareto(
    df: DataFrame,
    min_col: str,
    max_col: str,
    id_col: str,
) -> DataFrame:
    """2-D Pareto frontier (skyline): rows not strictly dominated in
    (minimize ``min_col``, maximize ``max_col``). Strict dominance: s
    dominates r iff s is ≤ in the min-dimension, ≥ in the
    max-dimension, and strictly better in at least one; equal points
    are mutually non-dominating and all stay on the frontier.

    Scale shape — the classic sort-scan skyline, distributed without a
    single-partition window:
    1. per-``min_col`` group maxima (map-side-combined groupBy);
       frontier candidates are rows matching their group's max.
    2. the strictly-smaller-prices prefix max runs over the GROUP
       relation via the budget_select machinery: range-partition by
       the min-dimension, per-partition maxima collected (bounded
       driver state: |partitions| values), exclusive prefix-max
       broadcast back, within-partition prefix via a partition-local
       window. A group survives iff its max strictly beats every
       smaller-key group's max.
    3. survivors broadcast back onto the row relation (frontier is
       small by construction).
    """
    groups = df.groupBy(min_col).agg(F.max(max_col).alias("__gmax"))
    p = (
        groups.repartitionByRange(32, F.col(min_col))
        .sortWithinPartitions(min_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = (
        p.groupBy("__pid").agg(F.max("__gmax").alias("m")).orderBy("__pid").collect()
    )
    offsets, running = {}, None
    for row in totals:
        if running is not None:
            offsets[row["__pid"]] = running
        running = row["m"] if running is None else max(running, row["m"])
    # exclusive prefix max per partition; a pid absent from the map
    # (the first non-empty partition, or an empty offsets dict when
    # only one partition holds data) looks up to NULL = "no earlier
    # partition", which greatest() then ignores
    if offsets:
        off = F.create_map(
            *[F.lit(x) for pid, m in offsets.items() for x in (pid, m)]
        )[F.col("__pid")]
    else:
        off = F.lit(None)
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(min_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.greatest(off, F.max("__gmax").over(w_local))
    frontier_groups = p.withColumn("__before", before).filter(
        F.col("__before").isNull() | (F.col("__gmax") > F.col("__before"))
    )
    return (
        df.join(
            F.broadcast(frontier_groups.select(min_col, "__gmax")), min_col
        )
        .filter(F.col(max_col) == F.col("__gmax"))
        .select(id_col, min_col, max_col)
    )


def event_freshness(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-type feed freshness (round 8): how far each event type's
    newest record lags the corpus's global high-water mark, plus the
    exact p95 inter-arrival gap — the two numbers a pipeline on-call
    reads first (a type whose staleness exceeds its own p95 cadence
    is LATE by its own historical standard, not by a magic constant).

    Exact: timestamps compare in integer micros; gaps are lag() diffs
    under the (ts, event_id) total order; p95 is the rank-⌈.95·n⌉
    order statistic (computed over map-side-combined (type, gap)
    tie groups — distinct integer gaps are few however many events
    there are). Lags run as a two-level decomposition (within-day
    windows + a tiny day-boundary frame, the sprt_ab_test pattern), so
    no window ever partitions on the bare low-cardinality type key. Returns (event_type, n_events,
    last_ts, staleness_s, p95_gap_s) with last_ts serialized to a
    string (the scd2_build timestamp-at-the-boundary convention).
    """
    base = events.where(
        F.col(type_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(type_col).alias("t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
        .cast("long")
        .alias("__day"),
        F.col(id_col).cast("long").alias("rid"),
    )
    # TWO-LEVEL lag (the sprt_ab_test decomposition): a bare-type lag
    # window serializes each type through one task (measured 10x at
    # the 100x events decade). Within-day lags run parallel across the
    # types×days grid; the day-boundary gaps (first event of a present
    # day vs last event of the previous present day) come from a lag
    # over the TINY per-day stats frame. The gap MULTISET equals the
    # global-lag form exactly — days are a prefix of the (us, rid)
    # total order.
    wd = Window.partitionBy("t", "__day").orderBy("us", "rid")
    within = (
        base.withColumn(
            "gap_s",
            F.floor((F.col("us") - F.lag("us").over(wd)) / 1_000_000).cast(
                "long"
            ),
        )
        .where(F.col("gap_s").isNotNull())
        .select("t", "gap_s")
    )
    day_stats = base.groupBy("t", "__day").agg(
        F.min("us").alias("__first"), F.max("us").alias("__last")
    )
    wdays = Window.partitionBy("t").orderBy("__day")
    boundary = (
        day_stats.withColumn("__prev_last", F.lag("__last").over(wdays))
        .where(F.col("__prev_last").isNotNull())
        .select(
            "t",
            F.floor(
                (F.col("__first") - F.col("__prev_last")) / 1_000_000
            ).cast("long").alias("gap_s"),
        )
    )
    gap_rows = within.unionByName(boundary)
    # exact p95 via tie groups: gaps collapse map-side to (type, gap)
    # counts, the cumulative walk runs over the small distinct-gap
    # frame, and the p95 is the smallest gap whose cumulative count
    # reaches rank ceil(0.95*n) — identical to the rank-window form.
    cells = gap_rows.groupBy("t", "gap_s").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wg = Window.partitionBy("t").orderBy("gap_s")
    wt = Window.partitionBy("t")
    p95 = (
        cells.withColumn("cum", F.sum("c").over(wg))
        .withColumn("n", F.sum("c").over(wt))
        .where(
            F.col("cum") - F.col("c")
            < F.expr("cast(ceil(0.95 * n) as bigint)")
        )
        .where(F.col("cum") >= F.expr("cast(ceil(0.95 * n) as bigint)"))
        .groupBy("t")
        .agg(F.min("gap_s").cast("long").alias("p95_gap_s"))
    )
    tops = base.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("us").alias("last_us"),
    )
    gmax = tops.agg(F.max("last_us").alias("gmax"))
    return (
        tops.crossJoin(F.broadcast(gmax))
        .join(p95, "t", "left")
        .select(
            F.col("t").alias(type_col),
            "n_events",
            F.date_format(
                F.timestamp_micros(F.col("last_us")),
                "yyyy-MM-dd HH:mm:ss.SSSSSS",
            ).alias("last_ts"),
            F.floor(
                (F.col("gmax") - F.col("last_us")) / 1_000_000
            ).cast("long").alias("staleness_s"),
            F.coalesce(F.col("p95_gap_s"), F.lit(0)).cast("long").alias(
                "p95_gap_s"
            ),
        )
    )

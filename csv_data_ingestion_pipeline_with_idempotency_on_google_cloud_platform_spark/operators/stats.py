"""Statistical profiling & experimentation operators.

A training-data pipeline is also a measurement pipeline: before a
corpus snapshot ships, someone asks "are these features correlated",
"did the new ingest arm move conversion", "how concentrated is the
traffic", "how uncertain is user retention". These close that loop as
distributed closed-form aggregations — no sampling, no driver math
beyond literals.

Determinism contract (the driver value-hashes results): inputs are
summed as DECIMAL (exact, order-free) or integers wherever a sum
crosses rows; floats appear only as scalar arithmetic on those exact
sums (deterministic IEEE ops on identical operands in any engine),
rounded at the output boundary. The Gini and EWMA paths are pure
integer arithmetic end to end.

Scale shape:
* ``corr_matrix`` — ONE scan, one 1-row aggregate carrying all
  O(k²) moment sums for k columns; the pair expansion happens on
  that single row (inline of a literal-shaped array), never on data.
* ``column_entropy`` — one stack() melt scan, two map-side-combined
  groupBys ((column, value) counts, then per-column moments).
* ``gini_concentration`` — per-group ranks via a window partitioned
  by the group key (parallel across groups; for a single monster
  group use packing.assign_global_ids like rfm_segments does).
* ``ab_conversion_ztest`` — arms are an md5-prefix hash of the unit
  key (same engine-agnostic split as sampling.hash_split), so
  assignment is a pure projection: one distinct on (type, user) and
  one tiny conditional-count aggregate; no join against an
  assignment table.
* ``target_encoding`` — one fact-to-dim equi-join (AQE picks
  broadcast when the dim fits) and a groupBy on the category; the
  global prior comes from re-aggregating the per-category partials,
  not a second scan.

No analogue exists in the reference (csv-processor-function/main.py
is ingest glue only); semantics follow the standard definitions
(two-proportion pooled z-test; Gini via the rank formula
G = (2·Σr·x − (n+1)·Σx)/(n·Σx) on ascending x; smoothed target
encoding per Micci-Barreca 2001).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket_col


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation over ``cols`` in ONE pass.

    Every moment (Σx, Σx², Σxy) is an exact DECIMAL(18,6) sum, so the
    aggregate is reproducible regardless of partition order; the
    correlation itself is scalar double arithmetic on those exact
    sums. Output: (col_a, col_b, n, corr) for each unordered pair
    with col_a < col_b, corr rounded to 6 dp (NULL when a column has
    zero variance).
    """
    from ..utils import parallelize_narrow

    dec = {c: F.col(c).cast("decimal(18,6)") for c in cols}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, a in enumerate(cols):
        aggs.append(F.sum(dec[a]).alias(f"__s_{i}"))
        for j in range(i, len(cols)):
            aggs.append(
                F.sum(dec[a] * dec[cols[j]]).alias(f"__p_{i}_{j}")
            )
    # the k + k(k+1)/2 DECIMAL product sums all evaluate map-side; a
    # single-file scan would run them on 1-2 cores (r9: spread first,
    # no-op at real scale — exact sums are partition-order-free)
    wide = parallelize_narrow(df.select(*[dec[c].alias(c) for c in cols])).agg(
        *aggs
    )

    nd = F.col("__n").cast("double")

    def _var(i: int) -> Column:
        s = F.col(f"__s_{i}").cast("double")
        return nd * F.col(f"__p_{i}_{i}").cast("double") - s * s

    pairs = []
    for i, a in enumerate(cols):
        for j in range(i + 1, len(cols)):
            num = (
                nd * F.col(f"__p_{i}_{j}").cast("double")
                - F.col(f"__s_{i}").cast("double")
                * F.col(f"__s_{j}").cast("double")
            )
            den = F.sqrt(_var(i) * _var(j))
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(cols[j]).alias("col_b"),
                    F.col("__n").alias("n"),
                    F.round(
                        F.when(den > 0, num / den), 6
                    ).alias("corr"),
                )
            )
    return wide.select(F.inline(F.array(*pairs)))


def column_entropy(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column Shannon entropy + cardinality profile.

    One stack() melt (single scan), then (column, value) counts and a
    per-column rollup using H = ln(n) − (Σ c·ln c)/n — the count-side
    identity that needs no per-row probability column. Counts are
    exact; the Σ c·ln c float sum is rounded to 6 dp at the boundary.
    Output: (column, n, n_distinct, entropy).
    """
    stack_args = []
    for c in cols:
        label = c.replace("'", "\\'")
        stack_args.append(f"'{label}'")
        stack_args.append(f"CAST(`{c}` AS STRING)")
    melted = df.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS (column, value)"
        )
    ).filter(F.col("value").isNotNull())
    counts = melted.groupBy("column", "value").agg(F.count(F.lit(1)).alias("c"))
    per_col = counts.groupBy("column").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
            "__clnc"
        ),
    )
    n = F.col("n").cast("double")
    return per_col.select(
        "column",
        "n",
        "n_distinct",
        F.round(F.log(n) - F.col("__clnc") / n, 6).alias("entropy"),
    )


def gini_concentration(
    df: DataFrame,
    group_col: str,
    unit_col: str,
    weight: Column | None = None,
) -> DataFrame:
    """Per-group Gini coefficient of how ``weight`` (default: row
    count) concentrates across units — "do 1% of users generate 90%
    of the traffic" as one number per group.

    Pure integer pipeline: unit totals are exact longs, units are
    ranked ascending inside each group by (total, unit) — total and
    deterministic — and the classic rank formula
    ``G = (2·Σr·x − (n+1)·Σx) / (n·Σx)`` is evaluated in milli-units
    with integer division, so the output is engine-exact. The rank
    window partitions by the group key (parallel across groups; a
    single monster group would use the rfm_segments range-partitioned
    rank instead). Output: (group, n_units, total, gini_milli).
    """
    w = weight if weight is not None else F.lit(1)
    per_unit = df.groupBy(
        F.col(group_col).alias("g"), F.col(unit_col).alias("u")
    ).agg(F.sum(w).cast("long").alias("x"))
    rw = Window.partitionBy("g").orderBy("x", "u")
    ranked = per_unit.withColumn("r", F.row_number().over(rw).cast("long"))
    sums = ranked.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("x").alias("total"),
        F.sum(F.col("r") * F.col("x")).alias("__srx"),
    )
    # integer `div` keeps the quotient exact past 2^53 (a double
    # division would not); numerator ≥ 0 because ranks ascend with x,
    # so truncating div == floor div == DuckDB's `//`
    return sums.select(
        F.col("g").alias(group_col),
        "n_units",
        "total",
        F.expr(
            "(1000 * (2 * __srx - (n_units + 1) * total))"
            " div (n_units * total)"
        ).alias("gini_milli"),
    )


def ab_conversion_ztest(
    events: DataFrame,
    unit_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Two-proportion pooled z-test of per-unit conversion between two
    deterministic hash arms, one row per event type.

    The arm is a projection of md5(unit) — the same engine-agnostic
    split sampling.hash_split uses — so there is no assignment table
    to join. Conversion = "unit emitted ≥1 event of this type". All
    counts are exact integers; rates and the z statistic are scalar
    double arithmetic on them, rounded to 6 dp (z = 0 where the
    pooled variance degenerates). Output: (event_type, users_a,
    users_b, conv_a, conv_b, rate_a, rate_b, z_score).
    """
    arm = F.when(
        hash_bucket_col(F.col("u"), 1) < F.lit("8"), F.lit("a")
    ).otherwise(F.lit("b"))
    units = (
        events.select(F.col(unit_col).alias("u"))
        .distinct()
        .select(arm.alias("arm"))
        .groupBy()
        .agg(
            F.sum(F.when(F.col("arm") == "a", 1).otherwise(0)).alias("users_a"),
            F.sum(F.when(F.col("arm") == "b", 1).otherwise(0)).alias("users_b"),
        )
    )
    conv = (
        events.select(F.col(type_col).alias("event_type"), F.col(unit_col).alias("u"))
        .distinct()
        .select("event_type", arm.alias("arm"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("arm") == "a", 1).otherwise(0)).alias("conv_a"),
            F.sum(F.when(F.col("arm") == "b", 1).otherwise(0)).alias("conv_b"),
        )
    )
    j = conv.crossJoin(F.broadcast(units))
    na = F.col("users_a").cast("double")
    nb = F.col("users_b").cast("double")
    pa = F.col("conv_a").cast("double") / na
    pb = F.col("conv_b").cast("double") / nb
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (na + nb)
    var = pooled * (1.0 - pooled) * (1.0 / na + 1.0 / nb)
    z = F.when(var > 0, (pa - pb) / F.sqrt(var)).otherwise(F.lit(0.0))
    return j.select(
        "event_type",
        "users_a",
        "users_b",
        "conv_a",
        "conv_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
    )


def target_encoding(
    facts: DataFrame,
    dims: DataFrame,
    fact_key: str,
    dim_key: str,
    category_col: str,
    value_col: str,
    smoothing: float = 20.0,
) -> DataFrame:
    """Smoothed mean target encoding of a categorical column — the
    leak-resistant replacement for one-hot on high-cardinality
    features: ``enc = (Σy + m·global_mean) / (n + m)``.

    One equi-join fact→dim (AQE broadcasts when the dim fits), one
    groupBy on the category with an exact DECIMAL(18,2) value sum,
    and the global prior re-aggregated FROM those per-category
    partials (window over the tiny aggregate — no second scan).
    Output: (category, n, raw_mean, encoded), means rounded to 6 dp.
    """
    joined = facts.join(
        dims.select(F.col(dim_key), F.col(category_col)),
        facts[fact_key] == dims[dim_key],
    )
    per_cat = joined.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__s"),
    )
    wall = Window.partitionBy(F.col("n") % 1)
    glob_mean = (
        F.sum(F.col("__s")).over(wall).cast("double")
        / F.sum(F.col("n")).over(wall).cast("double")
    )
    nd = F.col("n").cast("double")
    sd = F.col("__s").cast("double")
    m = F.lit(float(smoothing))
    return per_cat.select(
        "category",
        "n",
        F.round(sd / nd, 6).alias("raw_mean"),
        F.round((sd + m * glob_mean) / (nd + m), 6).alias("encoded"),
    )


def chi2_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Chi-square test of independence between two categorical
    columns, with Cramér's V effect size — the categorical twin of
    `mutual_info` (is language independent of source, is event type
    independent of arm).

    One map-side-combined groupBy builds the contingency table; the
    marginals come from windows over that tiny aggregate (mutual_info
    convention), so nothing rescans the fact table. Counts are exact
    integers; expected frequencies and the statistic are scalar
    double arithmetic on them, rounded to 6 dp. One output row:
    (n, n_a, n_b, dof, chi2, cramers_v).
    """
    cells = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wall = Window.partitionBy(F.col("c") % 1)
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    with_marg = cells.select(
        "a",
        "b",
        "c",
        F.sum("c").over(wa).alias("ra"),
        F.sum("c").over(wb).alias("cb"),
        F.sum("c").over(wall).alias("n"),
    )
    # the groupBy materializes only OBSERVED cells; zero cells still
    # owe their (0−e)²/e = e to the statistic. Expanding (c−e)²/e and
    # using Σ_all e = n gives χ² = Σ_observed c²/e − n — exact over
    # the full grid while only touching observed cells.
    e = (
        F.col("ra").cast("double")
        * F.col("cb").cast("double")
        / F.col("n").cast("double")
    )
    term = F.col("c").cast("double") * F.col("c").cast("double") / e
    out = with_marg.groupBy().agg(
        F.max("n").alias("n"),
        F.count_distinct("a").alias("n_a"),
        F.count_distinct("b").alias("n_b"),
        (F.sum(term) - F.max("n").cast("double")).alias("__chi2"),
    )
    dof = (F.col("n_a") - 1) * (F.col("n_b") - 1)
    mindim = F.least(F.col("n_a"), F.col("n_b")) - 1
    v = F.sqrt(
        F.col("__chi2") / (F.col("n").cast("double") * mindim.cast("double"))
    )
    return out.select(
        "n",
        "n_a",
        "n_b",
        dof.cast("long").alias("dof"),
        F.round("__chi2", 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
    )


def mann_whitney(
    events: DataFrame,
    unit_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Mann-Whitney U rank-sum test of ``value`` between the two md5
    hash arms, per event type — the nonparametric companion to
    `ab_conversion_ztest` for metrics too heavy-tailed for a means
    test.

    Tie-aware and integer-exact: values collapse to (type, value)
    groups, average ranks are carried DOUBLED (2·rank is an integer,
    so every rank sum is a long), and the normal approximation uses
    the tie-corrected variance — all scalar double math on exact
    integer sums, rounded to 6 dp. The rank window partitions by the
    type key (parallel across types). Output: (event_type, n_a, n_b,
    u_a, z_score). NULL values are dropped (a NULL would rank NULLS
    FIRST in Spark but NULLS LAST in the DuckDB oracle).
    """
    base = events.where(F.col(value_col).isNotNull()).select(
        F.col(type_col).alias("t"),
        F.col(value_col).alias("v"),
        F.when(
            hash_bucket_col(F.col(unit_col), 1) < F.lit("8"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("is_a"),
    )
    grp = base.groupBy("t", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("is_a").cast("long").alias("cnt_a"),
    )
    w = Window.partitionBy("t").orderBy("v")
    ranked = grp.withColumn(
        "start", F.sum("cnt").over(w) - F.col("cnt") + 1
    )
    # doubled average rank of the tie group: 2*start + cnt - 1 (integer)
    r2 = (2 * F.col("start") + F.col("cnt") - 1) * F.col("cnt_a")
    sums = ranked.groupBy("t").agg(
        F.sum("cnt_a").alias("n_a"),
        (F.sum("cnt") - F.sum("cnt_a")).alias("n_b"),
        F.sum(r2).alias("__r2a"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("__ties"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    u_a = (F.col("__r2a").cast("double") / 2.0) - na * (na + 1.0) / 2.0
    var = (
        na
        * nb
        / 12.0
        * ((n + 1.0) - F.col("__ties").cast("double") / (n * (n - 1.0)))
    )
    z = F.when(var > 0, (u_a - na * nb / 2.0) / F.sqrt(var)).otherwise(
        F.lit(0.0)
    )
    return sums.filter((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        F.col("t").alias(type_col),
        "n_a",
        "n_b",
        F.round(u_a, 6).alias("u_a"),
        F.round(z, 6).alias("z_score"),
    )


# Benford expected first-digit shares, milli: round(1000*log10(1+1/d)).
# Baked literals — no runtime log10 has to agree across engines.
BENFORD_MILLI = [301, 176, 125, 97, 79, 67, 58, 51, 46]


def benford_profile(
    df: DataFrame, amount_col: str, group_col: str | None = None
) -> DataFrame:
    """First-significant-digit profile of an amount column against
    Benford's law — the classic fabricated-numbers screen for
    financial or telemetry feeds.

    Digit extraction is integer-exact: amounts are scaled to cents
    (round → BIGINT) and the leading digit is the first character of
    the integer's decimal string — no runtime log10. Expected shares
    are baked milli literals; observed shares use integer `div`.
    Pure integer output: (digit, n_obs, p_obs_milli, p_benford_milli,
    dev_milli). One map-side-combined groupBy over one scan.
    """
    cents = F.round(F.col(amount_col) * 100).cast("long")
    digit = F.substring(F.abs(cents).cast("string"), 1, 1).cast("long")
    counts = (
        df.filter(F.abs(cents) >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    wall = Window.partitionBy(F.col("digit") % 1)
    exp_map = F.element_at(
        F.array(*[F.lit(m) for m in BENFORD_MILLI]), F.col("digit").cast("int")
    ).cast("long")
    with_tot = counts.withColumn("__tot", F.sum("n_obs").over(wall))
    return with_tot.select(
        "digit",
        "n_obs",
        F.expr("(1000 * n_obs) div __tot").alias("p_obs_milli"),
        exp_map.alias("p_benford_milli"),
        (F.expr("(1000 * n_obs) div __tot") - exp_map).alias("dev_milli"),
    )


def lorenz_curve(
    df: DataFrame,
    group_col: str,
    unit_col: str,
    n_points: int = 10,
) -> DataFrame:
    """Lorenz curve of weight concentration per group — the decile
    companion to `gini_concentration`: after sorting units ascending
    by weight, what share of total weight do the bottom 10%, 20%, …
    hold. (A uniform distribution puts the k-th decile at k/10; deep
    inequality pins early deciles near 0.)

    Integer-exact: unit totals, ranks, running sums and the decile
    bucketing all stay in longs; shares are milli integer divisions.
    Rank r closes point p when ``(r·P) div n`` strictly exceeds
    ``((r−1)·P) div n`` — the closed-form boundary test, no lag
    window. Ranks ride a per-group window (parallel across groups;
    monster groups → assign_global_ids, rfm convention). Points with
    an empty prefix (n < n_points) are omitted.
    Output: (group, point, n_units, cum_weight, share_milli).
    """
    per_unit = df.groupBy(
        F.col(group_col).alias("g"), F.col(unit_col).alias("u")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    rw = Window.partitionBy("g").orderBy("x", "u")
    wg = Window.partitionBy("g")
    ranked = per_unit.select(
        "g",
        "x",
        F.row_number().over(rw).cast("long").alias("r"),
        F.sum("x").over(rw.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.count(F.lit(1)).over(wg).cast("long").alias("n"),
        F.sum("x").over(wg).alias("tot"),
    )
    p = n_points
    boundary = ranked.filter(
        F.expr(f"(r * {p}) div n > ((r - 1) * {p}) div n")
    )
    return boundary.select(
        F.col("g").alias(group_col),
        F.expr(f"(r * {p}) div n").alias("point"),
        F.col("n").alias("n_units"),
        F.col("cum").alias("cum_weight"),
        F.expr("(1000 * cum) div tot").alias("share_milli"),
    )


def winsorized_stats(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    lower_q: float = 0.01,
    upper_q: float = 0.99,
) -> DataFrame:
    """Per-group winsorized moments: clamp values to the [p01, p99]
    band and report the clipped mean/std next to the raw mean — the
    feature-engineering staple that keeps a fat tail from owning a
    normalization constant.

    Exact percentiles (one aggregate pass) broadcast back; the
    clamped values are cast to DECIMAL(18,6) before summing so both
    clipped moments are order-free exact, with only the final scalar
    arithmetic in doubles (round 6). At corpus scale the same shape
    runs on approx_percentile sketches (`approx_quantiles` twin).

    Output: (group, n, p_lo, p_hi, mean_raw, mean_winsor, std_winsor).
    """
    bounds = events.groupBy(F.col(group_col).alias("g")).agg(
        F.expr(f"percentile({value_col}, {lower_q})").alias("p_lo"),
        F.expr(f"percentile({value_col}, {upper_q})").alias("p_hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__s_raw"),
    )
    j = events.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).join(F.broadcast(bounds), "g")
    clipped = F.least(F.greatest(F.col("v"), F.col("p_lo")), F.col("p_hi")).cast(
        "decimal(18,6)"
    )
    agg = j.groupBy("g").agg(
        F.max("n").alias("n"),
        F.max("p_lo").alias("p_lo"),
        F.max("p_hi").alias("p_hi"),
        F.max("__s_raw").alias("__s_raw"),
        F.sum(clipped).alias("__s_w"),
        F.sum(clipped * clipped).alias("__ss_w"),
    )
    nd = F.col("n").cast("double")
    mean_w = F.col("__s_w").cast("double") / nd
    var_w = (
        nd * F.col("__ss_w").cast("double")
        - F.col("__s_w").cast("double") * F.col("__s_w").cast("double")
    ) / (nd * (nd - 1.0))
    return agg.select(
        F.col("g").alias(group_col),
        "n",
        F.round("p_lo", 6).alias("p_lo"),
        F.round("p_hi", 6).alias("p_hi"),
        F.round(F.col("__s_raw").cast("double") / nd, 6).alias("mean_raw"),
        F.round(mean_w, 6).alias("mean_winsor"),
        F.round(F.sqrt(var_w), 6).alias("std_winsor"),
    )


def hhi_concentration(
    df: DataFrame, group_col: str, unit_col: str
) -> DataFrame:
    """Herfindahl-Hirschman concentration index per group — the
    antitrust-style single number (Σ share², 10000-point scale: 10000
    = monopoly, →0 = fragmented) complementing [Gini, Lorenz] with a
    squared-share view that weights the very largest units hardest.

    Pure integer: per-unit counts, Σx and Σx² are exact longs, and
    HHI = (10000·Σx²) div (Σx)² — integer `div`, engine-exact. One
    map-side-combined groupBy per level, no window at all. (Σx² and
    the (Σx)² product stay inside long range up to ~3·10⁹-event
    groups; past that, promote to DECIMAL sums.)
    Output: (group, n_units, total, hhi).
    """
    per_unit = df.groupBy(
        F.col(group_col).alias("g"), F.col(unit_col).alias("u")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    sums = per_unit.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("x").alias("total"),
        F.sum(F.col("x") * F.col("x")).alias("__sxx"),
    )
    return sums.select(
        F.col("g").alias(group_col),
        "n_units",
        "total",
        F.expr("(10000 * __sxx) div (total * total)").alias("hhi"),
    )


def cuped_adjust(
    events: DataFrame,
    split_date: str,
    unit_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013) for the md5-arm
    experiment: adjust each unit's post-period value by its
    PRE-period value, y' = y - theta*(x - mean(x)) with
    theta = cov(x,y)/var(x), and report the arm difference before and
    after adjustment plus the variance actually removed (rho^2).
    Pre-period behavior is unaffected by treatment, so the adjustment
    shrinks variance without biasing the diff — the standard way an
    experimentation platform doubles its effective sample size.

    All moments are exact integer cents from ONE per-unit aggregate
    (pre/post split by ``split_date``, arm = the same md5 projection
    as ab_conversion_ztest) followed by ONE 1-row rollup carrying
    global and per-arm sums; theta/variances are scalar doubles on
    those integers. Output 1 row: (n_a, n_b, theta, diff_raw,
    diff_adj, var_reduction_milli).
    """
    arm_a = hash_bucket_col(F.col("u"), 1) < F.lit("8")
    per_unit = (
        events.where(
            F.col(unit_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .groupBy(F.col(unit_col).alias("u"))
        .agg(
            F.floor(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(ts_col) < split_date,
                            F.col(value_col).cast("decimal(18,6)"),
                        )
                    ),
                    F.lit(0).cast("decimal(18,6)"),
                )
                * 100
            )
            .cast("long")
            .alias("x"),
            F.floor(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(ts_col) >= split_date,
                            F.col(value_col).cast("decimal(18,6)"),
                        )
                    ),
                    F.lit(0).cast("decimal(18,6)"),
                )
                * 100
            )
            .cast("long")
            .alias("y"),
        )
        .select("x", "y", arm_a.alias("is_a"))
    )
    m = per_unit.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.when(F.col("is_a"), 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("is_a"), F.col("x")).otherwise(0))
        .cast("long")
        .alias("sx_a"),
        F.sum(F.when(F.col("is_a"), F.col("y")).otherwise(0))
        .cast("long")
        .alias("sy_a"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    cov = F.col("sxy").cast("double") - sx * sy / n
    varx = F.col("sxx").cast("double") - sx * sx / n
    vary = F.col("syy").cast("double") - sy * sy / n
    theta = F.when(varx > 0, cov / varx).otherwise(F.lit(0.0))
    na = F.col("n_a").cast("double")
    nb = (F.col("n") - F.col("n_a")).cast("double")
    xa = F.col("sx_a").cast("double") / na
    xb = (F.col("sx") - F.col("sx_a")).cast("double") / nb
    ya = F.col("sy_a").cast("double") / na
    yb = (F.col("sy") - F.col("sy_a")).cast("double") / nb
    diff_raw = ya - yb
    diff_adj = (ya - theta * xa) - (yb - theta * xb)
    rho2 = F.when(
        (varx > 0) & (vary > 0), cov * cov / (varx * vary)
    ).otherwise(F.lit(0.0))
    # cents -> value units at the output boundary
    return m.select(
        "n_a",
        (F.col("n") - F.col("n_a")).alias("n_b"),
        F.round(theta, 6).alias("theta"),
        F.round(diff_raw / 100.0, 6).alias("diff_raw"),
        F.round(diff_adj / 100.0, 6).alias("diff_adj"),
        F.round(rho2 * 1000.0, 3).alias("var_reduction_milli"),
    )


def ks_test(
    events: DataFrame,
    unit_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test of ``value`` between the two
    md5 hash arms, per event type — the distribution-shape companion
    to `mann_whitney` (which only sees location): a KS hit with a null
    rank test means the arms differ in spread/tails, the classic
    symptom of a bucketing bug or a latency regression that moves
    variance, not the mean.

    Integer-exact supremum: values collapse to (type, value) groups,
    the ECDF gap at each distinct value is the integer
    ``|cum_a*n_b - cum_b*n_a|`` (cross-multiplied to avoid float
    division inside the max), carried as DECIMAL(38,0) so the product
    survives n ≈ 1e12 per arm. Only the final statistic divides.
    The asymptotic p-value uses the one-term Kolmogorov tail
    ``2*exp(-2*c^2)`` clipped to [0,1] — deterministic scalar math on
    the exact sums, rounded to 6 dp.

    Scale shape: one scan; (type, value) counts map-side combine; the
    running sums are windows partitioned by the type key (parallel
    across types, width = distinct values per type); the supremum is
    a per-type max aggregate. Nothing touches the driver.

    NULL values are dropped, not ranked: a NULL would become its own
    ECDF category whose window position differs between engines
    (Spark ASC = NULLS FIRST, DuckDB default = NULLS LAST), skewing
    the cumulative counts — the _propensity_units convention.
    """
    base = events.where(F.col(value_col).isNotNull()).select(
        F.col(type_col).alias("t"),
        F.col(value_col).alias("v"),
        F.when(
            hash_bucket_col(F.col(unit_col), 1) < F.lit("8"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("is_a"),
    )
    grp = base.groupBy("t", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("is_a").cast("long").alias("cnt_a"),
    )
    w = Window.partitionBy("t").orderBy("v")
    wall = Window.partitionBy("t")
    cum = (
        grp.withColumn("cum_a", F.sum("cnt_a").over(w).cast("long"))
        .withColumn(
            "cum_b", (F.sum("cnt").over(w) - F.sum("cnt_a").over(w)).cast("long")
        )
        .withColumn("n_a", F.sum("cnt_a").over(wall).cast("long"))
        .withColumn(
            "n_b", (F.sum("cnt").over(wall) - F.sum("cnt_a").over(wall)).cast("long")
        )
    )
    dec = "decimal(38,0)"
    gap = F.abs(
        F.col("cum_a").cast(dec) * F.col("n_b").cast(dec)
        - F.col("cum_b").cast(dec) * F.col("n_a").cast(dec)
    )
    sup = cum.groupBy("t").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max(gap).alias("__gap"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    d = F.col("__gap").cast("double") / (na * nb)
    c = d * F.sqrt(na * nb / (na + nb))
    p = F.least(F.lit(1.0), 2.0 * F.exp(-2.0 * c * c))
    return sup.filter((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        F.col("t").alias(type_col),
        "n_a",
        "n_b",
        F.round(d, 6).alias("d_stat"),
        F.round(c, 6).alias("ks_z"),
        F.round(p, 6).alias("p_approx"),
    )


def mahalanobis_anomaly(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: list[str],
    top_n: int = 50,
) -> DataFrame:
    """Top-N bivariate outliers by squared Mahalanobis distance — the
    correlation-aware anomaly screen a univariate z-score misses (a
    row can be unremarkable on each axis yet wildly off the joint
    trend, e.g. tiny quantity at a huge extended price).

    Closed-form 2-D: moments (n, Σx, Σy, Σx², Σy², Σxy) accumulate as
    exact DECIMAL(38,6) in ONE map-side-combined aggregate; the 2×2
    covariance inverse is inlined algebraically
    (d² = (dx²·σyy − 2·dx·dy·σxy + dy²·σxx)/det), so no matrix library
    and no driver math — the 1-row moment frame broadcast-joins back
    onto the data and d² is a pure projection. Top-N resolves as a
    TakeOrdered (per-partition heads, no global sort shuffle) with
    the key columns as the deterministic tiebreak. Degenerate inputs
    (det ≤ 0) yield an empty frame rather than NaNs.

    Output: (*key_cols, x, y, d2) with d2 rounded to 6 dp.

    DECIMAL(18,6) inputs keep the moment products at (38,12) — exact
    in Spark and on DuckDB's INT128 path (the corr_matrix convention);
    headroom is ~1e26, comfortably above 1e12 rows × 1e10 squares.

    Rows with NULL x/y are dropped up front (the _propensity_units
    convention): before, count(1) counted them while the moment sums
    skipped them, biasing the means/covariance, and NULL-coordinate
    rows could survive into the top-N with NULL d2.
    """
    df = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    dec = "decimal(18,6)"
    x = F.col(x_col).cast(dec)
    y = F.col(y_col).cast(dec)
    m = df.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    n = F.col("__n").cast("double")
    mx = F.col("__sx").cast("double") / n
    my = F.col("__sy").cast("double") / n
    sxx = F.col("__sxx").cast("double") / n - mx * mx
    syy = F.col("__syy").cast("double") / n - my * my
    sxy = F.col("__sxy").cast("double") / n - mx * my
    det = sxx * syy - sxy * sxy
    stats = m.select(
        mx.alias("__mx"),
        my.alias("__my"),
        sxx.alias("__sxx_c"),
        syy.alias("__syy_c"),
        sxy.alias("__sxy_c"),
        det.alias("__det"),
    )
    joined = df.crossJoin(F.broadcast(stats)).filter(F.col("__det") > 0)
    dx = F.col(x_col).cast("double") - F.col("__mx")
    dy = F.col(y_col).cast("double") - F.col("__my")
    d2 = (
        dx * dx * F.col("__syy_c")
        - 2.0 * dx * dy * F.col("__sxy_c")
        + dy * dy * F.col("__sxx_c")
    ) / F.col("__det")
    return (
        joined.select(
            *key_cols,
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
            F.round(d2, 6).alias("d2"),
        )
        .orderBy(F.desc("d2"), *key_cols)
        .limit(top_n)
    )


def _propensity_units(
    events: DataFrame, unit_col: str, value_col: str
) -> DataFrame:
    """Per-unit propensity frame (unit, n_events, score, is_t): score
    is the unit's mean event value in exact integer milli
    ((1000*Σcents) div (100*n)), treatment the md5 hash arm — shared
    by propensity_match and covariate_balance."""
    return (
        events.where(F.col(unit_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            F.col(unit_col).alias("unit"),
            # cents: the benford_profile convention — integer end to end
            F.round(F.col(value_col) * 100).cast("long").alias("v"),
        )
        .groupBy("unit")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").alias("s"),
        )
        .select(
            "unit",
            F.col("n").alias("n_events"),
            F.expr("(1000 * s) div (100 * n)").cast("long").alias("score"),
            F.when(
                hash_bucket_col(F.col("unit"), 1) < F.lit("8"), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("is_t"),
        )
    )


def propensity_match(
    events: DataFrame,
    unit_col: str = "user_id",
    value_col: str = "value",
    caliper_milli: int = 250,
) -> DataFrame:
    """Nearest-neighbor propensity matching (with replacement, caliper
    bound): pair every treated unit with the control whose score is
    closest, as long as the gap fits inside the caliper — the
    observational-causal primitive behind "did feature X move
    retention" when you cannot randomize. Treatment is the md5 hash
    arm (same rule as ab_conversion_ztest); the propensity proxy is
    the unit's mean event value in exact integer milli
    ((1000*Σcents) div (100*n) — cents per the benford convention,
    integer end to end).

    Matching-at-scale shape: NO sort-merge over the full score line
    and NO cross join — scores quantize to caliper-width buckets, each
    treated unit explodes to its 3 candidate buckets (a ×3 projection,
    the classic band-join trick), candidates equi-join on the bucket
    key, and the winner per treated unit resolves in a window
    partitioned by the treated key ordered by (gap, control id) — all
    exact integers, deterministic in any engine. A control can match
    many treated units (with-replacement), so no sequential greedy
    pass exists to serialize.

    Returns (treated_user, control_user, score_t, score_c, gap_milli)
    with gap_milli <= caliper_milli.
    """
    return _match_from_units(
        _propensity_units(events, unit_col, value_col), caliper_milli
    )


def _match_from_units(scores: DataFrame, caliper_milli: int) -> DataFrame:
    """Caliper band-join match over a precomputed _propensity_units
    frame — split out so covariate_balance aggregates events ONCE (it
    previously built the per-unit frame both directly and inside
    propensity_match, executing the full-events aggregation twice)."""
    c = int(caliper_milli)
    treated = scores.where(F.col("is_t") == 1).select(
        F.col("unit").alias("treated_user"), F.col("score").alias("score_t")
    )
    controls = scores.where(F.col("is_t") == 0).select(
        F.col("unit").alias("control_user"),
        F.col("score").alias("score_c"),
        F.expr(f"CASE WHEN score >= 0 THEN score div {c} ELSE -((-score + {c} - 1) div {c}) END").alias("bk"),
    )
    probes = treated.select(
        "treated_user",
        "score_t",
        F.explode(
            F.expr(
                f"array(CASE WHEN score_t >= 0 THEN score_t div {c} ELSE -((-score_t + {c} - 1) div {c}) END - 1,"
                f" CASE WHEN score_t >= 0 THEN score_t div {c} ELSE -((-score_t + {c} - 1) div {c}) END,"
                f" CASE WHEN score_t >= 0 THEN score_t div {c} ELSE -((-score_t + {c} - 1) div {c}) END + 1)"
            )
        ).alias("bk"),
    )
    cand = (
        probes.join(controls, "bk")
        .withColumn("gap_milli", F.abs(F.col("score_t") - F.col("score_c")))
        .where(F.col("gap_milli") <= c)
    )
    w = Window.partitionBy("treated_user").orderBy("gap_milli", "control_user")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("treated_user", "control_user", "score_t", "score_c", "gap_milli")
    )


def covariate_balance(
    events: DataFrame,
    unit_col: str = "user_id",
    value_col: str = "value",
    caliper_milli: int = 250,
) -> DataFrame:
    """Standardized mean differences before vs after propensity
    matching — the diagnostic that tells you whether the match
    actually balanced the arms (|SMD| < 0.1 is the usual bar) or just
    produced pairs. Covariates: the unit's event count and its mean
    value milli (the propensity score itself, so the post-match score
    SMD doubles as a match-quality metric).

    One long-format frame carries every (phase, covariate, arm) cell:
    pre-phase rows are the unit table itself, post-phase rows are the
    matched pairs joined back to unit covariates (controls counted
    once per pair — with-replacement matching weights them by reuse,
    the standard matched-sample convention). Moments are exact
    DECIMAL(38,0) sums over integer covariates; SMD =
    (mean_t − mean_c)/sqrt((var_t + var_c)/2) with sample variances is
    scalar double math on those sums, rounded to 6 dp (NULL when the
    pooled variance vanishes).

    Scale shape: the match reuses propensity_match's bucketed band
    join; the balance pass adds one stack projection and ONE
    map-side-combined groupBy on (phase, covariate, arm) — six cells
    of state per partition, no extra data-sized shuffle.

    Returns (covariate, phase, n_t, n_c, smd): 2 covariates × 2
    phases.
    """
    units = _propensity_units(events, unit_col, value_col)
    pairs = _match_from_units(units, caliper_milli)
    pre = units.select(
        F.lit("pre").alias("phase"), F.col("is_t"), "n_events", "score"
    )
    u_t = units.select(
        F.col("unit").alias("treated_user"),
        F.col("n_events").alias("t_ne"),
        F.col("score").alias("t_sc"),
    )
    u_c = units.select(
        F.col("unit").alias("control_user"),
        F.col("n_events").alias("c_ne"),
        F.col("score").alias("c_sc"),
    )
    post_w = pairs.join(u_t, "treated_user").join(u_c, "control_user")
    post = post_w.select(
        F.lit("post").alias("phase"), F.lit(1).alias("is_t"),
        F.col("t_ne").alias("n_events"), F.col("t_sc").alias("score"),
    ).unionAll(
        post_w.select(
            F.lit("post").alias("phase"), F.lit(0).alias("is_t"),
            F.col("c_ne").alias("n_events"), F.col("c_sc").alias("score"),
        )
    )
    long = (
        pre.unionAll(post)
        .select(
            "phase",
            "is_t",
            F.expr(
                "stack(2, 'n_events', n_events, 'score', score)"
            ).alias("covariate", "x"),
        )
        .select(
            "phase", "is_t", "covariate", F.col("x").cast("decimal(38,0)").alias("x")
        )
    )
    cells = long.groupBy("phase", "covariate").agg(
        F.sum(F.when(F.col("is_t") == 1, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(F.col("is_t") == 0, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(F.col("is_t") == 1, F.col("x"))).alias("st"),
        F.sum(F.when(F.col("is_t") == 0, F.col("x"))).alias("sc"),
        F.sum(F.when(F.col("is_t") == 1, F.col("x") * F.col("x"))).alias("sst"),
        F.sum(F.when(F.col("is_t") == 0, F.col("x") * F.col("x"))).alias("ssc"),
    )
    nt = F.col("n_t").cast("double")
    nc = F.col("n_c").cast("double")
    mt = F.col("st").cast("double") / nt
    mc = F.col("sc").cast("double") / nc
    vt = F.when(
        F.col("n_t") >= 2,
        (F.col("sst").cast("double") - nt * mt * mt) / (nt - 1.0),
    ).otherwise(F.lit(0.0))
    vc = F.when(
        F.col("n_c") >= 2,
        (F.col("ssc").cast("double") - nc * mc * mc) / (nc - 1.0),
    ).otherwise(F.lit(0.0))
    pooled = (vt + vc) / 2.0
    return cells.where((F.col("n_t") > 0) & (F.col("n_c") > 0)).select(
        "covariate",
        "phase",
        "n_t",
        "n_c",
        F.round(
            F.when(pooled > 0, (mt - mc) / F.sqrt(pooled)), 6
        ).alias("smd"),
    )


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    amount_col: str,
    qs_milli: tuple[int, ...] = (250, 500, 750, 900),
) -> DataFrame:
    """Per-group WEIGHTED quantiles of an amount, weighted by the
    amount itself — "the order size below which 25/50/75/90% of the
    *revenue* sits", per group. The unweighted percentile answers a
    row-count question; capacity planning and mix analysis need the
    mass-weighted one (a handful of whale orders IS half the revenue).

    Integer-exact: amounts collapse to (group, cents) with summed
    weights (map-side combine), the running mass is a window
    partitioned by the group key (parallel across groups, width =
    distinct amounts per group), and each quantile is a conditional
    MIN over rows where cum*1000 >= q*total — cross-multiplied
    integers, no float thresholds to drift. Output cents -> value
    units only at the boundary.

    Returns (group, n_rows, w_total_cents, wq_<q> per requested
    milli-quantile).
    """
    grp = (
        df.where(F.col(group_col).isNotNull() & F.col(amount_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.round(F.col(amount_col) * 100).cast("long").alias("cc"),
        )
        .groupBy("g", "cc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nn"),
            F.sum("cc").cast("long").alias("w"),
        )
    )
    word = Window.partitionBy("g").orderBy("cc")
    wall = Window.partitionBy("g")
    cum = (
        grp.withColumn("cw", F.sum("w").over(word).cast("long"))
        .withColumn("tw", F.sum("w").over(wall).cast("long"))
    )
    aggs = [
        F.sum("nn").alias("n_rows"),
        F.max("tw").alias("w_total_cents"),
    ]
    # DECIMAL(38,0) products: cum*1000 would overflow a long once the
    # per-group mass passes ~9e15 cents — real at the 100 TB target
    dec = "decimal(38,0)"
    for q in qs_milli:
        aggs.append(
            F.round(
                F.min(
                    F.when(
                        F.col("cw").cast(dec) * 1000
                        >= F.col("tw").cast(dec) * q,
                        F.col("cc"),
                    )
                ).cast("double")
                / 100.0,
                2,
            ).alias(f"wq_{q}")
        )
    return cum.groupBy("g").agg(*aggs).withColumnRenamed("g", group_col)


def ab_power_analysis(
    events: DataFrame,
    unit_col: str = "user_id",
    type_col: str = "event_type",
    mde_rel_milli: int = 100,
) -> DataFrame:
    """Two-proportion z-test power analysis (round 6): for each event
    type, the per-arm sample size required to detect a
    ``mde_rel_milli``/1000 relative lift over the observed arm-a
    conversion rate at alpha=0.05 (two-sided) with 80% and 90% power —
    the pre-experiment sizing readout that pairs with X45's
    ab_conversion_ztest (same md5 hash arms, same per-unit conversion
    definition).

    n per arm = (z_a*sqrt(2*pb*(1-pb)) + z_b*sqrt(p1*(1-p1)+p2*(1-p2)))^2
                / (p2-p1)^2,  pb = (p1+p2)/2

    with z constants as literals (1.959964 / 0.841621 / 1.281552).
    Counts are exact integers; the n formula is scalar double
    arithmetic on them, rounded to 6 dp BEFORE the ceil so the integer
    boundary cannot flip between engines, then reported alongside the
    observed arm size as a milli coverage ratio. Degenerate baselines
    (p1 = 0 or p2 >= 1) yield NULL sizes.

    Scale shape: two distinct-collapses (units, unit-types) and one
    per-type rollup — identical to ab_conversion_ztest; the power math
    is per-row scalar on the |types|-row table.

    Returns (event_type, users_a, conv_a, rate_a, n_req_80, n_req_90,
    coverage_milli_80).
    """
    arm_a = hash_bucket_col(F.col("u"), 1) < F.lit("8")
    units = (
        events.select(F.col(unit_col).alias("u"))
        .distinct()
        .where(arm_a)
        .agg(F.count(F.lit(1)).cast("long").alias("users_a"))
    )
    conv = (
        events.select(F.col(type_col).alias("event_type"), F.col(unit_col).alias("u"))
        .distinct()
        .where(arm_a)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("conv_a"))
    )
    j = conv.crossJoin(F.broadcast(units))
    p1 = F.col("conv_a").cast("double") / F.col("users_a").cast("double")
    p2 = p1 * (1.0 + mde_rel_milli / 1000.0)
    pb = (p1 + p2) / 2.0
    za, zb80, zb90 = 1.959964, 0.841621, 1.281552

    def n_req(zb: float):
        num = (
            za * F.sqrt(2.0 * pb * (1.0 - pb))
            + F.lit(zb) * F.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
        ) ** 2
        n = num / ((p2 - p1) * (p2 - p1))
        return F.when(
            (p1 > 0) & (p2 < 1), F.ceil(F.round(n, 6)).cast("long")
        ).otherwise(F.lit(None).cast("long"))

    base = j.select(
        "event_type",
        "users_a",
        "conv_a",
        F.round(p1, 6).alias("rate_a"),
        n_req(zb80).alias("n_req_80"),
        n_req(zb90).alias("n_req_90"),
    )
    return base.withColumn(
        "coverage_milli_80",
        F.expr("(1000 * users_a) div n_req_80").cast("long"),
    )


def did_estimator(
    events: DataFrame,
    unit_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Difference-in-differences estimate (round 6): the (treated −
    control) × (post − pre) interaction on per-unit outcomes — the
    workhorse quasi-experimental readout when assignment is by cohort
    and time, sitting next to X45's z-test (pure A/B) and X52's CUPED
    (variance reduction).

    Arms are the same md5 hash split as ab_conversion_ztest; periods
    split the observed day range at its midpoint (pre = first half).
    The outcome is each unit's value total per period in exact cents;
    cell moments (n, Σy, Σy²) are exact integers and the estimate

      did = (ȳ_b,post − ȳ_b,pre) − (ȳ_a,post − ȳ_a,pre),
      se  = √(Σ_cells s²/n),  z = did/se

    is scalar IEEE arithmetic on them, rounded to 6 dp.

    Scale shape: one distinct-ish groupBy to per-(unit, period) sums,
    one 4-cell rollup, broadcast 1-row date bounds — the
    ab_conversion_ztest plan with a period key.

    Returns one row: (n_a_pre, n_a_post, n_b_pre, n_b_post, mean_a_pre,
    mean_a_post, mean_b_pre, mean_b_post, did, se, z).
    """
    base = events.where(
        F.col(unit_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(unit_col).alias("u"),
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).cast("long").alias("d"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    bounds = base.agg(F.min("d").alias("__mn"), F.max("d").alias("__mx"))
    per_up = (
        base.crossJoin(F.broadcast(bounds))
        .withColumn(
            "period",
            F.when(
                2 * (F.col("d") - F.col("__mn")) < F.col("__mx") - F.col("__mn"),
                F.lit("pre"),
            ).otherwise(F.lit("post")),
        )
        .withColumn(
            "arm",
            F.when(
                hash_bucket_col(F.col("u"), 1) < F.lit("8"), F.lit("a")
            ).otherwise(F.lit("b")),
        )
        .groupBy("u", "arm", "period")
        .agg(F.sum("cents").cast("long").alias("y"))
    )
    cells = per_up.groupBy("arm", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    # 4-cell fold: conditional aggregates on the 4-row cell frame
    m = cells.agg(
        *[
            agg
            for arm in ("a", "b")
            for period in ("pre", "post")
            for agg in (
                F.sum(
                    F.when(
                        (F.col("arm") == arm) & (F.col("period") == period),
                        F.col("n"),
                    )
                )
                .cast("long")
                .alias(f"n_{arm}_{period}"),
                F.sum(
                    F.when(
                        (F.col("arm") == arm) & (F.col("period") == period),
                        F.col("sy"),
                    )
                )
                .cast("long")
                .alias(f"sy_{arm}_{period}"),
                F.sum(
                    F.when(
                        (F.col("arm") == arm) & (F.col("period") == period),
                        F.col("syy"),
                    )
                )
                .cast("long")
                .alias(f"syy_{arm}_{period}"),
            )
        ]
    )

    def mean(c):
        return F.col(f"sy_{c}").cast("double") / (
            F.lit(100.0) * F.col(f"n_{c}").cast("double")
        )

    def var_over_n(c):
        n = F.col(f"n_{c}").cast("double")
        sy = F.col(f"sy_{c}").cast("double")
        syy = F.col(f"syy_{c}").cast("double")
        # sample variance of the cents outcome, in value units (/100^2)
        return F.when(
            F.col(f"n_{c}") >= 2,
            ((syy - sy * sy / n) / (n - 1.0)) / (10000.0 * n),
        ).otherwise(F.lit(0.0))

    did = (mean("b_post") - mean("b_pre")) - (mean("a_post") - mean("a_pre"))
    se2 = (
        var_over_n("a_pre")
        + var_over_n("a_post")
        + var_over_n("b_pre")
        + var_over_n("b_post")
    )
    return m.select(
        "n_a_pre",
        "n_a_post",
        "n_b_pre",
        "n_b_post",
        F.round(mean("a_pre"), 6).alias("mean_a_pre"),
        F.round(mean("a_post"), 6).alias("mean_a_post"),
        F.round(mean("b_pre"), 6).alias("mean_b_pre"),
        F.round(mean("b_post"), 6).alias("mean_b_post"),
        F.round(did, 6).alias("did"),
        F.round(F.sqrt(se2), 6).alias("se"),
        F.round(
            F.when(se2 > 0, did / F.sqrt(se2)).otherwise(F.lit(0.0)), 6
        ).alias("z"),
    )


def burstiness_profile(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Count-data overdispersion diagnostics per group (round 6): the
    index of dispersion D = s²/x̄ of the daily counts on the 0-filled
    day grid, with the chi-square statistic (n−1)·D — the standard
    test of "is this arrival process Poisson-like or bursty?" that
    decides whether rate alarms can use Poisson bands (X46 CUSUM) or
    need the MAD/robust family (X45). D ≈ 1 Poisson; D ≫ 1 bursty;
    D < 1 more-regular-than-random.

    Integer moments (n, Σy, Σy²) on the grid, one IEEE expression on
    top rounded to 6 dp; overdispersed flag via the cross-
    multiplication n·Σy² − (Σy)² > Σy·(n−1) with each BIGINT moment
    widened to double BEFORE multiplying — the repo's overflow-safe
    convention (cross_corr_lag / did_estimator): engine-identical
    because both sides widen identically, but the comparison CAN flip
    within one ULP of the boundary once a moment exceeds 2⁵³ (≈9e15;
    a corpus would need ~10⁸ events/day-grid-cell² to get there).
    Exact-integer products are NOT the safer alternative: n·Σy²
    overflows BIGINT long before the double comparison loses the
    boundary (r6 ADVICE — docstring now matches the implementation).

    Scale shape: the daily rollup + a |groups|-row moment aggregate —
    the cross_corr_lag grid without the lag fan-out.

    Returns (event_type, n_days, mean_daily, dispersion, chi2,
    overdispersed).
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
        .select("t", F.coalesce("c", F.lit(0).cast("long")).alias("y"))
    )
    m = grid.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n_d = F.col("n").cast("double")
    sy_d = F.col("sy").cast("double")
    syy_d = F.col("syy").cast("double")
    var = (n_d * syy_d - sy_d * sy_d) / (n_d * (n_d - 1.0))
    mean = sy_d / n_d
    disp = var / mean
    return m.where((F.col("n") >= 2) & (F.col("sy") > 0)).select(
        F.col("t").alias("event_type"),
        F.col("n").alias("n_days"),
        F.round(mean, 6).alias("mean_daily"),
        F.round(disp, 6).alias("dispersion"),
        F.round((n_d - 1.0) * disp, 6).alias("chi2"),
        # D > 1  <=>  n*syy - sy^2 > sy*(n-1), exact in doubles here
        # and overflow-safe (moments widened like cross_corr_lag)
        (n_d * syy_d - sy_d * sy_d > sy_d * (n_d - 1.0)).cast("int").alias(
            "overdispersed"
        ),
    )


def trimmed_mean(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    trim_milli: int = 100,
) -> DataFrame:
    """Per-group exact trimmed mean (round 7): drop the lowest and
    highest ``trim_milli``/1000 of rows BY RANK and average the rest —
    the standard robust location estimate between mean (trim 0) and
    median (trim 500), the right summary for value columns with
    heavy-tailed junk that would otherwise dominate a plain mean.

    Engine-exact end to end: values scale to e6 BIGINT micros
    (round half-up, the repo convention), the trim boundary is the
    integer count ⌊n·trim/1000⌋ applied to a (value, id)-ordered rank
    (total order → identical trimmed SET in any engine), and the
    trimmed mean itself is an integer floor-div of the micro sum.

    Scale shape (round 8): TIE GROUPS, not a row rank — a rank window
    partitioned by the bare low-cardinality group key serializes each
    group through one task (measured 9.5× at the 100× events decade).
    Values collapse map-side to (group, value) counts, the cumulative
    walk runs over the small distinct-value frame, and each tie group
    contributes the exact overlap of its rank interval with the kept
    band (clip(min(cum, n−cut) − max(cum−c, cut))) — identical kept
    SET because equal values are interchangeable under the
    (value, id) total order. All integers; no float anywhere.

    Returns (group, n, n_trimmed, trimmed_mean_micro).
    """
    v = F.round(F.col(value_col).cast("double") * 1000000.0).cast("long")
    cells = (
        events.where(
            F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .select(F.col(group_col).alias("g"), v.alias("v"))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wv = Window.partitionBy("g").orderBy("v")
    wt = Window.partitionBy("g")
    stepped = cells.withColumn("cum", F.sum("c").over(wv)).withColumn(
        "n", F.sum("c").over(wt)
    )
    cut = F.expr(f"(n * {int(trim_milli)}) div 1000")
    kept_i = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), F.col("n") - cut)
        - F.greatest(F.col("cum") - F.col("c"), cut),
    )
    return (
        stepped.select("g", "v", "n", kept_i.alias("ki"))
        .groupBy("g")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.sum("ki").cast("long").alias("n_kept"),
            F.sum(F.col("ki") * F.col("v")).cast("long").alias("__sv"),
        )
        .where(F.col("n_kept") > 0)
        .select(
            F.col("g").alias(group_col),
            "n",
            (F.col("n") - F.col("n_kept")).alias("n_trimmed"),
            F.expr("__sv div n_kept").alias("trimmed_mean_micro"),
        )
    )


def chisq_independence(
    events: DataFrame,
    row_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Chi-square test of independence between the event type and the
    day-of-week of its timestamp (round 7) — "is the activity MIX
    day-of-week dependent?", the categorical association readout next
    to the numeric correlation family (X43) and the two-sample tests
    (X45/X73). Cramér's V normalizes the statistic to [0,1] effect
    size so it is comparable across tables.

    Observed counts are exact integers; χ² = Σ (O·N − r·c)² / (N·r·c)
    is evaluated with each integer widened to double BEFORE any
    product (the cross_corr_lag overflow convention) and rounded to
    6 dp; V = sqrt(χ²/(N·min(r−1,c−1))).

    Scale shape: ONE map-side-combined (type, dow) count aggregate
    (cells bounded by |types|×7), then cell-level arithmetic on the
    tiny contingency table with broadcast margins. Returns one row
    (n, n_rows, n_cols, dof, chi2, cramers_v).
    """
    cells = (
        events.where(F.col(row_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(row_col).alias("r"),
            F.dayofweek(F.to_date(ts_col)).cast("long").alias("c"),
        )
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    rt = cells.groupBy("r").agg(F.sum("o").cast("long").alias("rt"))
    ct = cells.groupBy("c").agg(F.sum("o").cast("long").alias("ct"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("r").cast("long").alias("n_rows"),
        F.countDistinct("c").cast("long").alias("n_cols"),
    )
    # the full r×c grid (zero cells included — a structurally absent
    # cell still contributes (0−E)²/E) via the margins' cross join:
    # both margins are bounded (|types|, ≤7), so this is tiny
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .join(cells, ["r", "c"], "left")
        .select("r", "c", "rt", "ct", F.coalesce("o", F.lit(0).cast("long")).alias("o"))
    )
    o_d = F.col("o").cast("double")
    rt_d = F.col("rt").cast("double")
    ct_d = F.col("ct").cast("double")
    n_d = F.col("n").cast("double")
    contrib = (o_d * n_d - rt_d * ct_d) * (o_d * n_d - rt_d * ct_d) / (
        n_d * rt_d * ct_d
    )
    return (
        grid.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").alias("n"),
            F.max("n_rows").alias("n_rows"),
            F.max("n_cols").alias("n_cols"),
            F.sum(contrib).alias("__chi2"),
        )
        .select(
            "n",
            "n_rows",
            "n_cols",
            ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).alias("dof"),
            F.round("__chi2", 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("__chi2")
                    / (
                        F.col("n").cast("double")
                        * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1).cast(
                            "double"
                        )
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
    )


def runs_test(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Wald–Wolfowitz runs test per group over the 0-filled daily count
    grid (round 7): dichotomize each day against the series median,
    count RUNS of consecutive same-side days, and z-score the count —
    the classic "is this sequence random or does it cluster?" test
    that catches serial dependence Mann–Kendall's monotonic S misses
    (a metric oscillating weekly trends nowhere but is wildly
    non-random).

    Exact integer mechanics: the median comparison is 2y vs the SUM of
    the two middle order statistics (no half-integer float), ties drop
    per the standard test; runs count via a lag over the day-ordered
    kept sequence; n1/n2/R exact BIGINT. z = (R − μ)/σ with the
    closed-form moments in doubles rounded to 6 dp (0 when σ
    degenerates).

    Scale shape: daily rollup + two rank windows on the group key +
    one lag window — all one-key shuffles; grid bounded by the date
    range. Returns (event_type, n_above, n_below, n_runs, z_score).
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
    wv = Window.partitionBy("t").orderBy("y", "d")
    wn = Window.partitionBy("t")
    ranked = grid.withColumn("rk", F.row_number().over(wv)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    # median2 = y_(⌊(n+1)/2⌋) + y_(⌈(n+1)/2⌉): odd n -> 2×middle,
    # even n -> sum of the two middle order stats — integers only
    mid = ranked.where(
        (F.col("rk") == F.expr("(n + 1) div 2"))
        | (F.col("rk") == F.expr("(n + 2) div 2"))
    ).groupBy("t").agg(
        F.when(F.count(F.lit(1)) == 1, 2 * F.max("y"))
        .otherwise(F.sum("y"))
        .cast("long")
        .alias("med2")
    )
    signed = (
        grid.join(mid, "t")
        .withColumn(
            "sgn",
            F.when(2 * F.col("y") > F.col("med2"), F.lit(1))
            .when(2 * F.col("y") < F.col("med2"), F.lit(-1))
            .otherwise(F.lit(0)),
        )
        .where(F.col("sgn") != 0)
    )
    wlag = Window.partitionBy("t").orderBy("d")
    runs = signed.withColumn("prev", F.lag("sgn").over(wlag)).groupBy("t").agg(
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0)).cast("long").alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("sgn") != F.col("prev")), 1
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("r"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = n1d + n2d
    mu = 2.0 * n1d * n2d / nd + 1.0
    var = (
        2.0
        * n1d
        * n2d
        * (2.0 * n1d * n2d - n1d - n2d)
        / (nd * nd * (nd - 1.0))
    )
    z = F.when(var > 0, (F.col("r").cast("double") - mu) / F.sqrt(var)).otherwise(
        F.lit(0.0)
    )
    return runs.where((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        F.col("t").alias("event_type"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.round(z, 6).alias("z_score"),
    )


def wasserstein_value_drift(
    events: DataFrame,
    unit_col: str = "user_id",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Earth-mover (Wasserstein-1) distance between the VALUE
    distributions of the two md5 hash arms, per event type (round 7) —
    the magnitude-aware drift readout next to X73's KS sup-gap: KS
    sees the worst POINT of CDF divergence, W1 integrates the whole
    gap in value units, which is what "how many milli-dollars of shift
    is this?" actually asks. Same deterministic first-hex-char arms as
    X45/X89 — no assignment table.

    Exactness: values quantize to e3 BIGINT milli; per-distinct-value
    cumulative arm counts are exact integers; each segment term
    dx·|cumA·n_b − cumB·n_a| is computed with the integers widened to
    double BEFORE multiplying (the cross_corr_lag overflow convention
    — the exact product can pass 2⁶³ at scale), summed and divided by
    n_a·n_b, rounded to 6 dp.

    Scale shape: one (type, value) count aggregate, two cumulative
    windows on the type key, one moment aggregate. Returns
    (event_type, n_a, n_b, n_values, w1_milli).
    """
    arm_a = hash_bucket_col(F.col("u"), 1) < F.lit("8")
    base = (
        events.where(
            F.col(unit_col).isNotNull()
            & F.col(group_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("t"),
            F.col(unit_col).alias("u"),
            F.round(F.col(value_col).cast("double") * 1000.0).cast("long").alias("v"),
        )
        .select("t", "v", arm_a.alias("is_a"))
    )
    cells = base.groupBy("t", "v").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("long").alias("cb"),
    )
    wv = Window.partitionBy("t").orderBy("v")
    wall = Window.partitionBy("t")
    stepped = (
        cells.withColumn("cum_a", F.sum("ca").over(wv))
        .withColumn("cum_b", F.sum("cb").over(wv))
        .withColumn("dx", F.lead("v").over(wv) - F.col("v"))
        .withColumn("n_a", F.sum("ca").over(wall))
        .withColumn("n_b", F.sum("cb").over(wall))
    )
    term = (
        F.col("dx").cast("double")
        * F.abs(
            F.col("cum_a").cast("double") * F.col("n_b").cast("double")
            - F.col("cum_b").cast("double") * F.col("n_a").cast("double")
        )
    )
    return (
        stepped.groupBy("t")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.sum(F.when(F.col("dx").isNotNull(), term).otherwise(F.lit(0.0))).alias(
                "__s"
            ),
        )
        .where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            F.col("t").alias("event_type"),
            "n_a",
            "n_b",
            "n_values",
            F.round(
                F.col("__s") / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("w1_milli"),
        )
    )


def srm_check(
    events: DataFrame,
    unit_col: str = "user_id",
    group_col: str = "event_type",
) -> DataFrame:
    """Sample-ratio-mismatch gate per event type (round 7): chi-square
    goodness-of-fit of the two md5 hash arms' DISTINCT-unit counts
    against the designed 50/50 — the first thing a trustworthy A/B
    platform checks before reading any metric (Fabijan 2019: a
    significant SRM invalidates the experiment, it does not "adjust").

    The flag is EXACT INTEGER: χ² = (u_a−u_b)²/(u_a+u_b) > 3.841
    (df=1, α=.05) decided as 1000·(u_a−u_b)² > 3841·(u_a+u_b) — no
    float in the verdict; the reported χ² is one rounded double on
    the same integers.

    One distinct + one count aggregate per type. Returns
    (event_type, users_a, users_b, chi2, srm_flag).
    """
    arm_a = hash_bucket_col(F.col("u"), 1) < F.lit("8")
    per_type = (
        events.where(F.col(unit_col).isNotNull() & F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("t"), F.col(unit_col).alias("u"))
        .distinct()
        .select("t", arm_a.alias("is_a"))
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("ua"),
            F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("long").alias("ub"),
        )
    )
    diff = F.col("ua") - F.col("ub")
    tot = F.col("ua") + F.col("ub")
    return per_type.where(tot > 0).select(
        F.col("t").alias("event_type"),
        F.col("ua").alias("users_a"),
        F.col("ub").alias("users_b"),
        F.round(
            diff.cast("double") * diff.cast("double") / tot.cast("double"), 6
        ).alias("chi2"),
        (1000 * diff * diff > 3841 * tot).cast("int").alias("srm_flag"),
    )


def hill_tail_index(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    k: int = 50,
) -> DataFrame:
    """Hill estimator of the power-law tail exponent per group
    (round 7, Hill 1975): α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₎) over the top-k+1
    order statistics — THE question heavy-tail data forces on every
    aggregate in this registry: α ≤ 1 means the mean itself does not
    exist (trimmed_mean/X102 is mandatory), α ≤ 2 means variance-based
    bands (X45/X46) are garbage; this query names which regime each
    value feed is in.

    Determinism: top-k+1 by a total order (value desc, event_id),
    realized as clipped TIE-GROUP counts (equal values are
    interchangeable, so the selected SET is identical and no per-row
    rank window on the bare group key is needed); ln/Σ on the k ratios rounded
    to 6 dp (the X13 ln convention). Only strictly-positive values
    participate (a power-law tail is positive by definition); groups
    with fewer than k+1 such rows are dropped rather than estimated
    from a vanishing tail, and so are degenerate groups whose top k+1
    values are all EQUAL (ln-sum exactly 0 — a capped/constant feed has
    no tail to estimate; ANSI Spark would raise DIVIDE_BY_ZERO where
    the oracle NULLs, so both engines drop the group instead).

    Scale shape: one rank window on the group key, a k-row-per-group
    aggregate — the tail is CONSTANT-sized however large the corpus.
    Returns (group, n_pos, k, alpha, x_k_milli).
    """
    pos = events.where(
        F.col(group_col).isNotNull()
        & F.col(value_col).isNotNull()
        & (F.col(value_col) > 0)
    ).select(
        F.col(group_col).alias("g"),
        F.round(F.col(value_col).cast("double") * 1000.0).cast("long").alias("v"),
    ).where(F.col("v") > 0)
    # TIE GROUPS, not a row rank (round 8): ranking every positive row
    # by the bare low-cardinality group key serialized each group
    # through one task (measured 10.5x at the 100x events decade).
    # Equal values are interchangeable under the (value desc, id)
    # total order, so the top-k+1 SET is: full tie groups while the
    # descending cumulative count stays under k+1, plus the exact
    # remainder of the boundary group — and x_k is the boundary
    # group's value. The oracle SQL computes the same clipped-count
    # form so the ln-term multiset matches exactly.
    cells = pos.groupBy("g", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wv = Window.partitionBy("g").orderBy(F.col("v").desc())
    wt = Window.partitionBy("g")
    stepped = cells.withColumn("cum", F.sum("c").over(wv)).withColumn(
        "n_pos", F.sum("c").over(wt)
    )
    xk = stepped.where(
        (F.col("cum") - F.col("c") < k + 1) & (F.col("cum") >= k + 1)
    ).select("g", F.col("v").alias("xk"))
    clip50 = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), F.lit(int(k)).cast("long"))
        - (F.col("cum") - F.col("c")),
    )
    tail = (
        stepped.where(F.col("cum") - F.col("c") < k)
        .join(xk, "g")
        .select(
            "g",
            "n_pos",
            clip50.alias("ck"),
            (
                clip50.cast("double")
                * F.log(
                    F.col("v").cast("double") / F.col("xk").cast("double")
                )
            ).alias("__term"),
            F.col("xk"),
        )
    )
    return (
        tail.groupBy("g")
        .agg(
            F.max("n_pos").cast("long").alias("n_pos"),
            F.sum("ck").cast("long").alias("k"),
            F.sum("__term").alias("__s"),
            F.max("xk").alias("__xk"),
        )
        .where((F.col("k") == k) & (F.col("__s") > 0))
        .select(
            F.col("g").alias(group_col),
            "n_pos",
            "k",
            F.round(F.col("k").cast("double") / F.col("__s"), 6).alias("alpha"),
            F.col("__xk").alias("x_k_milli"),
        )
    )


def corpus_source_hhi(
    docs: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """Herfindahl–Hirschman concentration of the corpus across sources
    (round 7): HHI = Σ shareᵢ² and its reciprocal, the EFFECTIVE number
    of sources — the one-line answer to "is this a 20-source corpus or
    a 2-source corpus wearing 20 names?" that decides whether X8b
    temperature mixing / X69 UniMax have anything to rebalance.

    Integer-exact: counts are BIGINT; hhi_micro = (10⁶·Σcᵢ²) div N²
    with the products widened to double before multiplying (the
    cross_corr_lag overflow convention — Σc² passes 2⁶³ near 10-billion
    -doc corpora) then floored — engine-identical because both sides
    widen identically; effective_sources = round(N²/Σcᵢ², 6).

    One count aggregate + a 1-row rollup. Returns
    (n_docs, n_sources, hhi_micro, effective_sources, top_share_milli).
    """
    counts = (
        docs.where(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        counts.agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.sum(F.col("c").cast("double") * F.col("c").cast("double")).alias("__s2"),
            F.max("c").cast("long").alias("__mx"),
        )
        .select(
            "n_docs",
            "n_sources",
            F.floor(
                1000000.0
                * F.col("__s2")
                / (F.col("n_docs").cast("double") * F.col("n_docs").cast("double"))
            )
            .cast("long")
            .alias("hhi_micro"),
            F.round(
                F.col("n_docs").cast("double")
                * F.col("n_docs").cast("double")
                / F.col("__s2"),
                6,
            ).alias("effective_sources"),
            F.expr("(1000 * __mx) div n_docs").cast("long").alias("top_share_milli"),
        )
    )


def hash_uniformity_audit(
    events: DataFrame,
    unit_col: str = "user_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Uniformity audit of the md5 bucket assignment every splitter in
    this repo trusts (round 7): KS sup-gap of distinct units across
    the 256 two-hex-char buckets against the uniform CDF — the infra
    check behind hash_split / the A/B arms / the reservoir samples:
    if md5-over-this-key-space is NOT uniform, every "deterministic
    10% sample" downstream silently isn't one.

    Exact integers end to end: bucket = first two hex chars (0..255);
    D·(n·256) = max over buckets of |256·cum_count − n·(b+1)| is an
    exact BIGINT cross-multiplication (no float in the sup); the
    reported d_milli and the 1.358/√n (α=.05, two-sided, baked
    coefficient 1358) flag are one rounded/int expression on top.

    One distinct + one 256-cell aggregate + a cumulative window over
    256 rows. Returns one row (n_units, n_buckets, max_abs_dev_x,
    d_milli, ks_flag) where max_abs_dev_x = max|256·cum − n·(b+1)|.
    """
    units = (
        events.where(F.col(unit_col).isNotNull())
        .select(F.col(unit_col).cast("string").alias("u"))
        .distinct()
        .select(
            F.conv(F.substring(F.md5(F.col("u")), 1, 2), 16, 10)
            .cast("long")
            .alias("b")
        )
    )
    cells = units.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    # complete 0-filled bucket axis so empty buckets still move the CDF
    axis = (
        cells.sparkSession.range(n_buckets)
        .select(F.col("id").cast("long").alias("b"))
        .join(cells, "b", "left")
        .select("b", F.coalesce("c", F.lit(0).cast("long")).alias("c"))
    )
    w = Window.partitionBy(F.col("b") % 1).orderBy("b")
    stepped = (
        axis.withColumn("cum", F.sum("c").over(w))
        .withColumn("n", F.sum("c").over(Window.partitionBy(F.col("b") % 1)))
        .withColumn(
            "dev",
            F.abs(
                F.lit(n_buckets).cast("long") * F.col("cum")
                - F.col("n") * (F.col("b") + 1)
            ),
        )
    )
    nb = F.lit(n_buckets).cast("long")
    return stepped.groupBy().agg(
        F.max("n").alias("n_units"),
        nb.alias("n_buckets"),
        F.max("dev").alias("max_abs_dev_x"),
    ).select(
        "n_units",
        "n_buckets",
        "max_abs_dev_x",
        F.expr("(1000 * max_abs_dev_x) div (n_units * n_buckets)")
        .cast("long")
        .alias("d_milli"),
        # D = dev_x/(n·B) > 1.358/√n  ⟺  dev_x² · 10⁶ > 1358² · n · B²
        # (square both sides, scale the 1.358 to the integer 1358/10³)
        # — double-widened per the overflow convention, identical in
        # any engine because both sides widen identically
        (
            F.col("max_abs_dev_x").cast("double")
            * F.col("max_abs_dev_x").cast("double")
            * 1000000.0
            > 1358.0
            * 1358.0
            * F.col("n_units").cast("double")
            * F.col("n_buckets").cast("double")
            * F.col("n_buckets").cast("double")
        )
        .cast("int")
        .alias("ks_flag"),
    )


def markov_entropy_rate(
    events: DataFrame,
    unit_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """First-order Markov entropy rate of event sequences (round 7):
    H(next | prev) = Σ p(prev)·H(next|prev) in milli-nats over the
    per-user event streams, next to the unconditional type entropy
    H(next) — the gap between them is exactly how much the previous
    event type PREDICTS the next one (zero gap: types arrive i.i.d.,
    sequence models have nothing to learn from order; large gap:
    transition structure carries real signal — the go/no-go number
    for sequence-aware features over X23's path mining).

    Exact transition counts via the same lag-over-(user, ts, id)
    ordering as X6's transition matrix; entropies are count ratios
    with ln in doubles rounded to 6 dp at milli scale (X48
    convention). One lag window + two tiny aggregates over the
    |types|² matrix. Returns one row
    (n_transitions, n_types, h_next_milli, h_cond_milli,
    predictability_gain_milli).
    """
    wseq = Window.partitionBy("u").orderBy("ts", "eid")
    pairs = (
        events.where(
            F.col(unit_col).isNotNull()
            & F.col(type_col).isNotNull()
            & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(unit_col).alias("u"),
            F.col(type_col).alias("nxt"),
            F.col(ts_col).alias("ts"),
            F.col("event_id").alias("eid"),
        )
        .withColumn("prv", F.lag("nxt").over(wseq))
        .where(F.col("prv").isNotNull())
        .groupBy("prv", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pt = pairs.groupBy("prv").agg(F.sum("c").cast("long").alias("cp"))
    nt = pairs.groupBy("nxt").agg(F.sum("c").cast("long").alias("cn"))
    tot = pairs.agg(
        F.sum("c").cast("long").alias("n"),
        F.countDistinct("nxt").cast("long").alias("n_types"),
    )
    h_next = (
        nt.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                -(F.col("cn").cast("double") / F.col("n").cast("double"))
                * F.log(F.col("cn").cast("double") / F.col("n").cast("double"))
            ).alias("h")
        )
    )
    h_cond = (
        pairs.join(F.broadcast(pt), "prv")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                -(F.col("c").cast("double") / F.col("n").cast("double"))
                * F.log(F.col("c").cast("double") / F.col("cp").cast("double"))
            ).alias("hc")
        )
    )
    return (
        tot.crossJoin(F.broadcast(h_next))
        .crossJoin(F.broadcast(h_cond))
        .select(
            F.col("n").alias("n_transitions"),
            "n_types",
            F.round(F.col("h") * 1000.0, 6).alias("h_next_milli"),
            F.round(F.col("hc") * 1000.0, 6).alias("h_cond_milli"),
            F.round((F.col("h") - F.col("hc")) * 1000.0, 6).alias(
                "predictability_gain_milli"
            ),
        )
    )


def kruskal_wallis(
    events: DataFrame,
    type_col: str = "event_type",
    unit_col: str = "user_id",
    value_col: str = "value",
    n_arms: int = 4,
) -> DataFrame:
    """Kruskal–Wallis H test of ``value`` across ``n_arms`` md5 hash
    arms, per event type (round 8) — the k-sample generalization of
    `mann_whitney`: the omnibus gate a multi-variant experiment runs
    BEFORE any pairwise comparison (k·(k−1)/2 Mann–Whitney tests
    without it is the classic multiple-testing foot-gun).

    Same integer discipline as mann_whitney: values collapse to
    (type, value) tie groups, average ranks are carried DOUBLED
    (2·rank is an integer, so every per-arm rank sum is an exact
    long), and the tie-corrected H is scalar double math over those
    exact sums, rounded to 6 dp — with Σ_g R_g²/n_g evaluated as a
    FIXED-ORDER arm-0..arm-3 chain on both engines (pivoted columns,
    not an unordered SUM), so even the pre-round double is
    bit-identical:

        H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1),  H_c = H / (1 − ΣT/(N³−N))

    Arms come from the first hex char of md5(user_id): char div
    (16/n_arms) — uniform, deterministic, engine-identical. The rank
    window partitions by type (parallel across types); tie groups are
    map-side combinable before it. Output:
    (event_type, n, arm_sizes_csv, h_stat, h_corrected) for types
    where every arm is non-empty. R_g² can pass 2⁶³ only past ~3e9
    rows per type; deployments at that scale bucket values first.
    """
    if n_arms <= 0 or 16 % n_arms != 0:
        raise ValueError(
            f"n_arms must divide 16 (hex-char arm split), got {n_arms}"
        )
    arm = (
        F.conv(F.substring(F.md5(F.col(unit_col).cast("string")), 1, 1), 16, 10)
        .cast("int")
        / (16 // n_arms)
    ).cast("int")
    base = events.where(
        F.col(value_col).isNotNull()
        & F.col(unit_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(type_col).alias("t"),
        F.col(value_col).alias("v"),
        arm.alias("arm"),
    )
    grp = base.groupBy("t", "v", "arm").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tie = grp.groupBy("t", "v").agg(F.sum("cnt").cast("long").alias("tot"))
    w = Window.partitionBy("t").orderBy("v")
    ranked = tie.withColumn(
        "start", F.sum("tot").over(w) - F.col("tot") + 1
    )
    # doubled average rank of the tie group (integer)
    joined = grp.join(ranked.select("t", "v", "tot", "start"), ["t", "v"])
    r2 = (2 * F.col("start") + F.col("tot") - 1) * F.col("cnt")
    # pivot to one exact-integer column pair per arm: the Σ R_g²/n_g
    # reduction then runs as a FIXED-ORDER 4-term double sum, so the
    # float result is bit-identical to the oracle's identical chain
    # (an unordered SUM over double terms could differ in the last ulp)
    piv = joined.groupBy("t").agg(
        *[
            F.sum(F.when(F.col("arm") == a, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias(f"__n{a}")
            for a in range(n_arms)
        ],
        *[
            F.sum(F.when(F.col("arm") == a, r2).otherwise(0))
            .cast("long")
            .alias(f"__r{a}")
            for a in range(n_arms)
        ],
    )
    ties = tie.groupBy("t").agg(
        F.sum(
            F.col("tot") * F.col("tot") * F.col("tot") - F.col("tot")
        ).cast("long").alias("__T")
    )
    all_nonempty = F.col("__n0") > 0
    for a in range(1, n_arms):
        all_nonempty = all_nonempty & (F.col(f"__n{a}") > 0)
    nonempty = piv.where(all_nonempty).join(ties, "t")
    n_total = None
    for a in range(n_arms):
        term = F.col(f"__n{a}")
        n_total = term if n_total is None else n_total + term
    sr2 = None
    for a in range(n_arms):
        t = (
            (F.col(f"__r{a}").cast("double") / 2.0)
            * (F.col(f"__r{a}").cast("double") / 2.0)
            / F.col(f"__n{a}").cast("double")
        )
        sr2 = t if sr2 is None else sr2 + t
    sums = nonempty.withColumn("n", n_total.cast("long")).withColumn(
        "__sr2", sr2
    )
    nn = F.col("n").cast("double")
    h = 12.0 / (nn * (nn + 1.0)) * F.col("__sr2") - 3.0 * (nn + 1.0)
    corr = 1.0 - F.col("__T").cast("double") / (nn * nn * nn - nn)
    hc = F.when(corr > 0, h / corr).otherwise(F.lit(0.0))
    return sums.select(
        F.col("t").alias(type_col),
        "n",
        F.concat_ws(
            ",", *[F.col(f"__n{a}").cast("string") for a in range(n_arms)]
        ).alias("arm_sizes_csv"),
        F.round(h, 6).alias("h_stat"),
        F.round(hc, 6).alias("h_corrected"),
    )


def sprt_ab_test(
    events: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
    threshold_milli: int = 50_000,
    p0_milli: int = 400,
    p1_milli: int = 600,
    alpha_milli: int = 50,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test per event type (round
    8, Wald 1945): walk the type's events in (ts, event_id) order,
    treat value > threshold as a Bernoulli success, accumulate the
    log-likelihood ratio of H1: p=p1 vs H0: p=p0, and stop at the
    first crossing of the ±ln((1−β)/α) boundaries — the ONLINE
    experiment gate that calls a winner in O(1/KL) samples instead of
    waiting for the fixed-horizon test (`ab_power` sizes that one).
    This batch fold is the replayable twin of a streaming monitor:
    state per type is two integers (successes, trials).

    Integer-exact: the per-observation LLR increments are CONSTANTS
    (micro-scaled: s·round(1e6·ln(p1/p0)) + f·round(1e6·ln((1−p1)/
    (1−p0)))), so the cumulative LLR is an exact integer cumsum and
    the first-crossing index is engine-identical; ln() runs on driver
    literals only, never per row.

    Scale shape: the sequential walk is a TWO-LEVEL prefix sum —
    cumsum windows within (type, day) partitions plus a per-day offset
    from a cumsum over the tiny day-totals frame (broadcast back), so
    parallelism is types×days instead of bare types; a bare-type
    window serialized each type through one task and measured 8.7×
    at the 100× events decade before this decomposition. Returns
    (event_type, n_events, n_success, llr_micro_final, decision,
    n_at_decision, llr_micro_at_decision).
    """
    import math

    a_mil = alpha_milli / 1000.0
    up = round(1e6 * math.log((1 - a_mil) / a_mil))
    lo = -up
    l_s = round(1e6 * math.log(p1_milli / p0_milli))
    l_f = round(1e6 * math.log((1000 - p1_milli) / (1000 - p0_milli)))
    base = events.where(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"),
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
        .cast("long")
        .alias("__day"),
        F.col(id_col).cast("long").alias("rid"),
        (
            F.round(F.col(value_col).cast("double") * 1000.0).cast("long")
            > F.lit(int(threshold_milli))
        )
        .cast("long")
        .alias("s"),
    )
    # TWO-LEVEL prefix sum: a cumsum window partitioned by the bare
    # type key serializes each type through ONE task (5 types = 5
    # tasks; measured 8.7x at the 100x events decade). Instead the
    # walk runs WITHIN (type, day) partitions — parallel across the
    # types×days grid — and each day adds a per-(type,day) offset
    # computed by a cumsum over the TINY per-day totals frame. The
    # (ts, rid) total order is preserved exactly: days are a prefix of
    # it, so offset(day) + within-day prefix == the global prefix.
    inc = F.col("s") * F.lit(int(l_s)) + (1 - F.col("s")) * F.lit(int(l_f))
    wd = Window.partitionBy("t", "__day").orderBy("ts", "rid")
    within = base.withColumn("__cum", F.sum(inc).over(wd)).withColumn(
        "__drn", F.row_number().over(wd)
    )
    day_tot = base.groupBy("t", "__day").agg(
        F.sum(inc).cast("long").alias("__dt"),
        F.count(F.lit(1)).cast("long").alias("__dn"),
    )
    wdays = Window.partitionBy("t").orderBy("__day")
    offsets = day_tot.select(
        "t",
        "__day",
        (F.coalesce(F.sum("__dt").over(wdays), F.lit(0)) - F.col("__dt"))
        .cast("long")
        .alias("__off"),
        (F.coalesce(F.sum("__dn").over(wdays), F.lit(0)) - F.col("__dn"))
        .cast("long")
        .alias("__noff"),
    )
    walked = within.join(F.broadcast(offsets), ["t", "__day"]).select(
        "t",
        "s",
        (F.col("__off") + F.col("__cum")).alias("llr"),
        (F.col("__noff") + F.col("__drn")).alias("rn"),
    )
    first = (
        walked.where(
            (F.col("llr") >= F.lit(int(up))) | (F.col("llr") <= F.lit(int(lo)))
        )
        .groupBy("t")
        .agg(F.min(F.struct("rn", "llr")).alias("__f"))
        .select(
            "t",
            F.col("__f.rn").cast("long").alias("n_at_decision"),
            F.col("__f.llr").cast("long").alias("llr_micro_at_decision"),
        )
    )
    out = (
        walked.groupBy("t")
        .agg(
            F.max("rn").cast("long").alias("n_events"),
            F.sum("s").cast("long").alias("n_success"),
            F.max(F.struct("rn", "llr"))["llr"].cast("long").alias(
                "llr_micro_final"
            ),
        )
        .join(first, "t", "left")
        .select(
            F.col("t").alias(type_col),
            "n_events",
            "n_success",
            "llr_micro_final",
            F.when(F.col("llr_micro_at_decision") >= F.lit(int(up)), F.lit("accept_h1"))
            .when(F.col("llr_micro_at_decision") <= F.lit(int(lo)), F.lit("accept_h0"))
            .otherwise(F.lit("continue"))
            .alias("decision"),
            F.coalesce(F.col("n_at_decision"), F.lit(0)).cast("long").alias(
                "n_at_decision"
            ),
            F.coalesce(F.col("llr_micro_at_decision"), F.lit(0)).cast("long").alias(
                "llr_micro_at_decision"
            ),
        )
    )
    return out


def spearman_activity_value(
    events: DataFrame,
    type_col: str = "event_type",
    unit_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Spearman rank correlation between a user's ACTIVITY (event
    count) and VALUE (total value) per event type (round 8) — the
    robust "do heavy users spend more?" readout that X43's Pearson
    matrix gets wrong on heavy-tailed value feeds (one whale user sets
    the Pearson sign; Spearman sees only ranks).

    Integer discipline (the mann_whitney scheme): per-user totals are
    exact (value in e3 milli longs), tie groups carry DOUBLED average
    ranks so every rank is an exact integer, and ρ is computed from
    the rank covariance in one fixed double chain on exact integer
    sums (the squared-rank moments widened to decimal(38,0) — Σrx²
    reaches 4n³ and would pass BIGINT near a million users per type;
    DuckDB's SUM widens to HUGEINT the same way), rounded to 6 dp. With d_i = rx_i − ry_i (doubled-rank
    difference), ρ = 1 − 6·Σd²/(4·n(n²−1)) adjusted for ties via the
    standard Pearson-on-ranks form — implemented as Pearson over the
    doubled ranks (tie-exact, no approximation).

    Scale shape: one per-(type, user) aggregate (map-side combined),
    two rank windows on the type key, one moment rollup. Returns
    (event_type, n_users, rho).
    """
    per_user = (
        events.where(
            F.col(unit_col).isNotNull()
            & F.col(type_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .groupBy(
            F.col(type_col).alias("t"), F.col(unit_col).alias("u")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum(
                F.round(F.col(value_col).cast("double") * 1000.0).cast("long")
            )
            .cast("long")
            .alias("y"),
        )
    )

    def doubled_rank(col: str, out: str):
        grp = per_user.groupBy("t", F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        w = Window.partitionBy("t").orderBy("v")
        ranked = grp.withColumn(
            "start", F.sum("cnt").over(w) - F.col("cnt") + 1
        ).select(
            "t",
            F.col("v").alias(col),
            (2 * F.col("start") + F.col("cnt") - 1).alias(out),
        )
        return ranked

    rx = doubled_rank("x", "rx")
    ry = doubled_rank("y", "ry")
    joined = per_user.join(rx, ["t", "x"]).join(ry, ["t", "y"])
    sums = joined.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.expr("cast(rx * rx as decimal(38,0))")).alias("sxx"),
        F.sum(F.expr("cast(ry * ry as decimal(38,0))")).alias("syy"),
        F.sum(F.expr("cast(rx * ry as decimal(38,0))")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    vx = n * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    vy = n * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    rho = F.when(
        (vx > 0) & (vy > 0), cov / F.sqrt(vx) / F.sqrt(vy)
    ).otherwise(F.lit(0.0))
    return sums.where(F.col("n") >= 2).select(
        F.col("t").alias(type_col),
        F.col("n").alias("n_users"),
        F.round(rho, 6).alias("rho"),
    )


def overdispersion_index(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Variance-to-mean ratio of the DAILY event-count series per type
    (round 8): D = Var(c_d)/E(c_d) over every day in the type's
    observed span (absent days are true zeros — they enter through the
    span length, not a grid explode) — the one-number answer to "is
    this feed Poisson or bursty", which decides whether X45/X46's
    variance bands need a negative-binomial correction and whether
    X96's burstiness flag has a base rate to stand on.

    Exact integers into one double chain: per-day counts are exact,
    Σc and Σc² are exact longs, n_days = max−min+1 exactly; mean =
    S1/n, population var = S2/n − mean², D = var/mean, all rounded
    6 dp. One (type, day) aggregate + one rollup. Returns
    (event_type, n_days, n_events, mean_per_day, dispersion).
    """
    base = events.where(
        F.col(type_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(type_col).alias("t"),
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
        .cast("long")
        .alias("d"),
    )
    daily = base.groupBy("t", "d").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    agg = daily.groupBy("t").agg(
        (F.max("d") - F.min("d") + 1).cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    n = F.col("n_days").cast("double")
    mean = F.col("s1").cast("double") / n
    var = F.col("s2").cast("double") / n - mean * mean
    disp = F.when(mean > 0, var / mean).otherwise(F.lit(0.0))
    return agg.select(
        F.col("t").alias(type_col),
        "n_days",
        F.col("s1").alias("n_events"),
        F.round(mean, 6).alias("mean_per_day"),
        F.round(disp, 6).alias("dispersion"),
    )


def sprt_daily_ledger(
    events: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
    threshold_milli: int = 50_000,
    p0_milli: int = 400,
    p1_milli: int = 600,
    alpha_milli: int = 50,
) -> DataFrame:
    """Per-(type, day) SPRT state ledger (round 9): the running Wald
    statistic AT EACH DAY BOUNDARY — exactly the update row
    `streaming/sprt_stream.py` emits per micro-batch under the
    file-per-day ingest discipline, replayed in batch so the
    streaming monitor's core arithmetic accrues driver-oracle
    evidence (VERDICT r8 item 8; the srm_check-readout precedent).

    Same constants and integer discipline as `sprt_ab_test` (the
    final-row twin): constant micro-LLR increments, exact integer
    cumsums, first crossing under the (ts, event_id) total order,
    LATCHED decision — a day after the crossing still reports the
    crossing's decision/n/llr while the running LLR keeps walking.

    Scale shape: the within-day walk is needed only to find the FIRST
    CROSSING (the sprt_ab_test two-level decomposition, parallel over
    types×days); every ledger column then derives from cumsums over
    the TINY per-day totals frame. Returns one row per (event_type,
    day): (event_type, day, n_events_cum, n_success_cum,
    llr_micro_eod, decision, n_at_decision, llr_micro_at_decision).
    """
    import math

    a_mil = alpha_milli / 1000.0
    up = round(1e6 * math.log((1 - a_mil) / a_mil))
    lo = -up
    l_s = round(1e6 * math.log(p1_milli / p0_milli))
    l_f = round(1e6 * math.log((1000 - p1_milli) / (1000 - p0_milli)))
    base = events.where(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"),
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
        .cast("long")
        .alias("__day"),
        F.col(id_col).cast("long").alias("rid"),
        (
            F.round(F.col(value_col).cast("double") * 1000.0).cast("long")
            > F.lit(int(threshold_milli))
        )
        .cast("long")
        .alias("s"),
    )
    inc = F.col("s") * F.lit(int(l_s)) + (1 - F.col("s")) * F.lit(int(l_f))
    wd = Window.partitionBy("t", "__day").orderBy("ts", "rid")
    within = base.withColumn("__cum", F.sum(inc).over(wd)).withColumn(
        "__drn", F.row_number().over(wd)
    )
    day_tot = base.groupBy("t", "__day").agg(
        F.sum(inc).cast("long").alias("__dt"),
        F.count(F.lit(1)).cast("long").alias("__dn"),
        F.sum("s").cast("long").alias("__ds"),
    )
    wdays = Window.partitionBy("t").orderBy("__day")
    cums = day_tot.select(
        "t",
        "__day",
        F.sum("__dt").over(wdays).cast("long").alias("llr_micro_eod"),
        F.sum("__dn").over(wdays).cast("long").alias("n_events_cum"),
        F.sum("__ds").over(wdays).cast("long").alias("n_success_cum"),
        (F.sum("__dt").over(wdays) - F.col("__dt"))
        .cast("long")
        .alias("__off"),
        (F.sum("__dn").over(wdays) - F.col("__dn"))
        .cast("long")
        .alias("__noff"),
    )
    walked = within.join(
        F.broadcast(cums.select("t", "__day", "__off", "__noff")),
        ["t", "__day"],
    ).select(
        "t",
        F.col("__day"),
        (F.col("__off") + F.col("__cum")).alias("llr"),
        (F.col("__noff") + F.col("__drn")).alias("rn"),
    )
    first = (
        walked.where(
            (F.col("llr") >= F.lit(int(up))) | (F.col("llr") <= F.lit(int(lo)))
        )
        .groupBy("t")
        .agg(F.min(F.struct("rn", "llr", "__day")).alias("__f"))
        .select(
            "t",
            F.col("__f.rn").cast("long").alias("__frn"),
            F.col("__f.llr").cast("long").alias("__fllr"),
            F.col("__f.__day").cast("long").alias("__fday"),
        )
    )
    epoch = F.lit("1970-01-01").cast("date")
    decided = F.col("__fday").isNotNull() & (
        F.col("__day") >= F.col("__fday")
    )
    return (
        cums.join(first, "t", "left")
        .select(
            F.col("t").alias(type_col),
            F.date_format(
                F.date_add(epoch, F.col("__day").cast("int")), "yyyy-MM-dd"
            ).alias("day"),
            "n_events_cum",
            "n_success_cum",
            "llr_micro_eod",
            F.when(
                decided & (F.col("__fllr") >= F.lit(int(up))),
                F.lit("accept_h1"),
            )
            .when(
                decided & (F.col("__fllr") <= F.lit(int(lo))),
                F.lit("accept_h0"),
            )
            .otherwise(F.lit("continue"))
            .alias("decision"),
            F.when(decided, F.col("__frn"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_at_decision"),
            F.when(decided, F.col("__fllr"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("llr_micro_at_decision"),
        )
    )

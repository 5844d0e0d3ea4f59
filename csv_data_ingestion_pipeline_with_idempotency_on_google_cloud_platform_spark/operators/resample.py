"""Resampling inference: cluster jackknife and permutation tests.

X45's closed-form z-test assumes independent units and a normal
sampling distribution. The two estimators here drop those
assumptions the way a measurement pipeline actually needs at corpus
scale: the delete-one-GROUP jackknife prices clustered data (events
cluster inside users; the naive per-row SE is too small), and the
permutation test replaces the normal approximation with the empirical
null — without either ever materializing a resample.

The classical formulations redraw the dataset B times. Distributed,
that is the wrong shape (B shuffles of the corpus). Both operators
below restate the resample as ALGEBRA over one pass of exact sums:

* jackknife — every leave-one-group-out mean is a closed form of the
  global (n, S) and that group's (n_g, S_g): theta_g = (S-S_g)/(n-n_g).
  One map-side-combined groupBy produces all G replicates at once;
  the replicate moments are summed as milli-quantized BIGINTs (exact,
  order-free — the determinism contract in operators/stats.py).
* permutation — the relabeling of row r in replicate b is a pure
  projection md5(b:r), so "B resamples" is one crossJoin against a
  B-row literal frame and ONE aggregation to (B, 2) exact partial
  sums; the shuffle carries partitions x B cells, never data x B.

Reference scope: extension X50 (SURVEY.md §2b) — experimentation
depth over the same event stream the reference merely counts
(csv-processor-function/main.py:120-137).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# micro quantization for replicate moments: replicates enter the sum
# as floor((theta_g - mean) * 1e6) — CENTERED first, because the
# jackknife sum of squares is shift-invariant and leave-one-out means
# hug the global mean, so quantizing the deviation keeps 1e-6
# resolution with small integers (envelope: Sum t^2 < 2^63 holds up
# to ~1e5 groups at deviations <= ~10 value units; far beyond any
# per-slice clustering this is pointed at). Exact and order-free
# where a double sum over groups would be neither.
_MICRO = 1000000.0


def jackknife_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Delete-one-group jackknife SE of the global mean of
    ``value_col``, clustering by ``group_col`` (Tukey 1958; the
    grouped form is the design-effect-aware SE survey pipelines use).

    One groupBy produces every replicate: group partials (n_g, S_g)
    are exact DECIMAL/BIGINT; the global (n, S, G) rides the SAME
    aggregate via a window keyed on a non-foldable constant (the
    repo's single-scan total-over-aggregate idiom — the window sees G
    already-collapsed rows, never data); theta_g = (S - S_g) /
    (n - n_g) is scalar double arithmetic per group; replicate
    moments are summed as centered micro-quantized BIGINTs.
    var_jack = (G-1)/G * Sum(theta_g - mean(theta))^2 comes off those
    two integers in the final 1-row projection.

    Output 1 row: (n_rows, n_groups, mean_value, jk_se, ci_lo, ci_hi)
    with the 95% normal-interval bounds; doubles rounded to 6 dp.
    """
    from pyspark.sql import Window

    parts = (
        df.where(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("s_g"),
        )
    )
    wall = Window.partitionBy(F.col("n_g") % 1)
    enriched = parts.select(
        "n_g",
        "s_g",
        F.sum("n_g").over(wall).cast("long").alias("n"),
        F.sum("s_g").over(wall).alias("s"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_groups"),
    )
    theta = (F.col("s") - F.col("s_g")).cast("double") / (
        F.col("n") - F.col("n_g")
    ).cast("double")
    center = F.col("s").cast("double") / F.col("n").cast("double")
    t_micro = F.floor((theta - center) * F.lit(_MICRO)).cast("long")
    reps = (
        enriched.select(
            "n", "n_groups", F.col("s").alias("s_all"), t_micro.alias("t")
        )
        .groupBy("n", "n_groups", "s_all")
        .agg(
            F.sum("t").cast("long").alias("st"),
            F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        )
    )
    g = F.col("n_groups").cast("double")
    st = F.col("st").cast("double")
    stt = F.col("stt").cast("double")
    # var_jack = (G-1)/G * SS where SS = stt - st^2/G (replicate sum of
    # squares in micro^2, shift-invariant so centering cancels); guard
    # the single-group degenerate case
    var = F.when(
        F.col("n_groups") > 1,
        (g - 1.0) / g * (stt - st * st / g) / (_MICRO * _MICRO),
    ).otherwise(F.lit(0.0))
    mean = F.col("s_all").cast("double") / F.col("n").cast("double")
    se = F.sqrt(F.greatest(var, F.lit(0.0)))
    return reps.select(
        F.col("n").alias("n_rows"),
        "n_groups",
        F.round(mean, 6).alias("mean_value"),
        F.round(se, 6).alias("jk_se"),
        F.round(mean - 1.96 * se, 6).alias("ci_lo"),
        F.round(mean + 1.96 * se, 6).alias("ci_hi"),
    )


def jackknife_ratio(
    df: DataFrame,
    group_col: str,
    num_col: str,
    den_col: str,
) -> DataFrame:
    """Delete-one-group jackknife SE of a RATIO OF SUMS
    R = Sum(num)/Sum(den) — the estimator class the jackknife exists
    for: R is nonlinear in the data, so no closed-form SE exists, yet
    every leave-one-group-out replicate is still pure algebra over the
    per-group partials: theta_g = (Sx - Sx_g) / (Sy - Sy_g).

    Same machinery as jackknife_mean (single scan, totals via the
    non-foldable-key window over the G collapsed rows, centered
    micro-quantized BIGINT replicate moments); groups whose removal
    empties the denominator are the caller's modeling problem — the
    math guards only the single-group degenerate case.

    Output 1 row: (n_rows, n_groups, ratio, jk_se, ci_lo, ci_hi).
    """
    from pyspark.sql import Window

    parts = (
        df.where(
            F.col(group_col).isNotNull()
            & F.col(num_col).isNotNull()
            & F.col(den_col).isNotNull()
        )
        .groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum(F.col(num_col).cast("decimal(18,6)")).alias("sx_g"),
            F.sum(F.col(den_col).cast("decimal(18,6)")).alias("sy_g"),
        )
    )
    wall = Window.partitionBy(F.col("n_g") % 1)
    enriched = parts.select(
        "sx_g",
        "sy_g",
        F.sum("n_g").over(wall).cast("long").alias("n"),
        F.sum("sx_g").over(wall).alias("sx"),
        F.sum("sy_g").over(wall).alias("sy"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_groups"),
    )
    theta = (F.col("sx") - F.col("sx_g")).cast("double") / (
        F.col("sy") - F.col("sy_g")
    ).cast("double")
    center = F.col("sx").cast("double") / F.col("sy").cast("double")
    t_micro = F.floor((theta - center) * F.lit(_MICRO)).cast("long")
    reps = (
        enriched.select(
            "n",
            "n_groups",
            F.col("sx").alias("sx_all"),
            F.col("sy").alias("sy_all"),
            t_micro.alias("t"),
        )
        .groupBy("n", "n_groups", "sx_all", "sy_all")
        .agg(
            F.sum("t").cast("long").alias("st"),
            F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        )
    )
    g = F.col("n_groups").cast("double")
    st = F.col("st").cast("double")
    stt = F.col("stt").cast("double")
    var = F.when(
        F.col("n_groups") > 1,
        (g - 1.0) / g * (stt - st * st / g) / (_MICRO * _MICRO),
    ).otherwise(F.lit(0.0))
    ratio = F.col("sx_all").cast("double") / F.col("sy_all").cast("double")
    se = F.sqrt(F.greatest(var, F.lit(0.0)))
    return reps.select(
        F.col("n").alias("n_rows"),
        "n_groups",
        F.round(ratio, 6).alias("ratio"),
        F.round(se, 6).alias("jk_se"),
        F.round(ratio - 1.96 * se, 6).alias("ci_lo"),
        F.round(ratio + 1.96 * se, 6).alias("ci_hi"),
    )


def permutation_test(
    df: DataFrame,
    type_col: str,
    value_col: str,
    id_col: str,
    type_a: str,
    type_b: str,
    reps: int = 100,
) -> DataFrame:
    """Two-sample permutation test of the difference in means between
    ``type_a`` and ``type_b`` rows, relabeled deterministically.

    Replicate b relabels row r into arm A iff BIT b of md5(r) is set
    — each row is hashed ONCE into two 60-bit longs (120 independent
    engine-agnostic coins, reps <= 120) and the replicate frame
    carries its bit-divisor as a literal column, so the per-cell work
    is one long div + mod instead of an md5 (or even a hex decode)
    per (row, replicate): measured 3.8 s -> 1.6 s for the relabeled
    aggregation at sf0.1. This is the
    random-relabeling form of the permutation test: arm sizes vary
    binomially around n/2 instead of being held fixed, which keeps
    the null exchangeable while avoiding B global sorts. The B
    replicates come from one crossJoin against a broadcast B-row
    frame; ONE aggregation reduces the (row x replicate) cells to B
    exact (DECIMAL sum, count) pairs per arm, so the shuffle is
    partitions x B combiner cells regardless of data size.

    p = (1 + #{b : T_b >= T_obs}) / (B + 1), T = |mean_a - mean_b|
    (add-one: the observed labeling is itself a permutation). Output
    1 row: (b_reps, n_a, n_b, t_obs, n_ge, p_milli) — p in exact
    integer milli, T rounded to 6 dp.
    """
    if reps > 120:
        raise ValueError("permutation_test: reps must be <= 120 hash bits")
    spark = df.sparkSession
    m = F.md5(F.col(id_col).cast("string"))
    base = (
        df.where(
            F.col(type_col).isin([type_a, type_b])
            & F.col(id_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .select(
            F.conv(F.substring(m, 1, 15), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(m, 16, 15), 16, 10).cast("long").alias("h2"),
            (F.col(type_col) == type_a).alias("is_a"),
            F.col(value_col).cast("decimal(18,6)").alias("v"),
        )
        # one explicit round-robin exchange (r9): obs and the replicate
        # aggregation both consume base — without a shared boundary each
        # re-runs the double-md5 projection, and a single-file scan
        # would run the B-coin replicate stage on 1-2 cores; the
        # exchange computes the hashes once and both consumers reuse it
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )

    def _stat(sa: Column, na: Column, sb: Column, nb: Column) -> Column:
        return F.when(
            (na > 0) & (nb > 0),
            F.abs(
                sa.cast("double") / na.cast("double")
                - sb.cast("double") / nb.cast("double")
            ),
        ).otherwise(F.lit(0.0))

    # the relabeled arms are complementary within every replicate
    # (sa + sb = S, na + nb = n, with S and n constant across
    # replicates), so the replicate aggregation only needs the A-arm:
    # FILTER coin-true cells and sum them plain — half the aggregate
    # input and no CASE branch per cell (measured 3.9 s -> 1.4 s for
    # the replicate aggregation at sf0.1)
    obs = base.groupBy().agg(
        F.sum("v").alias("s_all"),
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum(F.when(F.col("is_a"), F.col("v"))).alias("o_sa"),
        F.count(F.when(F.col("is_a"), 1)).cast("long").alias("o_na"),
    )
    reps_df = spark.range(reps).select(
        F.col("id").cast("int").alias("b"),
        F.expr("shiftleft(cast(1 as bigint), cast(id % 60 as int))").alias(
            "dv"
        ),
        (F.col("id") < 60).alias("lo"),
    )
    # bit b of the row's md5: integer div by the replicate's literal
    # power-of-two then mod 2 — identical arithmetic in any engine
    coin = F.expr("((case when lo then h1 else h2 end div dv) % 2) = 1")
    per_rep = (
        base.select("h1", "h2", "v")
        .crossJoin(F.broadcast(reps_df))
        .where(coin)
        .groupBy("b")
        .agg(
            F.sum("v").alias("sa"),
            F.count(F.lit(1)).cast("long").alias("na"),
        )
    )
    t_obs = _stat(
        F.col("o_sa"),
        F.col("o_na"),
        F.col("s_all") - F.col("o_sa"),
        F.col("n_all") - F.col("o_na"),
    )
    t_b = _stat(
        F.col("sa"),
        F.col("na"),
        F.col("s_all") - F.col("sa"),
        F.col("n_all") - F.col("na"),
    )
    joined = per_rep.crossJoin(F.broadcast(obs))
    out = joined.groupBy(
        "o_na", (F.col("n_all") - F.col("o_na")).alias("o_nb")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("b_reps"),
        F.sum(F.when(t_b >= t_obs, 1).otherwise(0)).cast("long").alias("n_ge"),
        F.max(F.round(t_obs, 6)).alias("t_obs"),
    )
    return out.select(
        "b_reps",
        F.col("o_na").alias("n_a"),
        F.col("o_nb").alias("n_b"),
        "t_obs",
        "n_ge",
        F.expr("(1000 * (1 + n_ge)) div (b_reps + 1)").alias("p_milli"),
    )


# exact 60-bit Poisson(1) CDF thresholds (k = 0..4); u >= the last one
# draws weight 5 (P = 6e-4 tail truncation, documented below)
_POIS1_T = [
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
]


def _pois1_weight(u: Column) -> Column:
    """Truncated Poisson(1) inverse-CDF over a uniform 60-bit long —
    the same literal integer thresholds the oracle states, so the draw
    is engine-exact."""
    w = F.lit(5)
    for k in range(len(_POIS1_T) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS1_T[k]), F.lit(k)).otherwise(w)
    return w


def pois1_weight_sql(u: str) -> str:
    """DuckDB twin of :func:`_pois1_weight`."""
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS1_T)
    )
    return f"(CASE {branches} ELSE 5 END)"


def poisson_bootstrap(
    df: DataFrame,
    value_col: str,
    id_col: str,
    reps: int = 100,
    where: Column | None = None,
) -> DataFrame:
    """Percentile-bootstrap CI of the mean via the Poisson bootstrap —
    the resampling scheme that actually works on distributed data
    (Chamandy et al., published at Google): instead of drawing n rows
    with replacement (a global shuffle per replicate), every row
    independently enters replicate b with weight ~ Poisson(1). Each
    (row, replicate) weight is a deterministic function of
    md5(id:b), so the oracle replays the identical resamples.

    Truncation: weights cap at 5 (P(W>5) ~ 6e-4); with n rows the
    expected count of truncated cells per replicate is ~0.0006n and
    the induced mean bias is far below the CI's own Monte-Carlo noise.

    Shape: B replicates = one narrow generator (explode of a literal
    0..B-1 sequence); ONE map-side-combined aggregation reduces the
    cells to B exact (DECIMAL weighted sum, BIGINT weight count) pairs
    — shuffle is partitions x B combiner cells regardless of data
    size; the CI is a ceil-rank order statistic over the B-row
    replicate table. Replicate means are exact integer micro-units (no
    float accumulates), so the whole output is drift-free.

    Two r9 notes from measurement: (1) w = 0 cells are NOT filtered —
    they contribute 0 to both aggregate sums, and the filter's pushed
    predicate re-evaluated the md5/conv draw a second time per cell
    (codegen subexpression elimination works within one operator's
    expressions, not across a filter/project boundary); unfiltered,
    every cell pays exactly one md5. (2) a higher-order-function form
    (per-row transform/filter array) was measured ~2x SLOWER than this
    flat projection: lambda bodies evaluate interpreted, while the
    6-branch CASE here is whole-stage-codegen'd with the md5 CSE'd.

    Output 1 row: (b_reps, n, mean_micro, ci_lo_micro, ci_hi_micro)
    at the 2.5/97.5 percentiles.
    """
    from pyspark.sql import Window

    base = df.where(
        (F.lit(True) if where is None else where)
        & F.col(id_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(id_col).cast("string").alias("rid"),
        # exact integer micro-units up front: every downstream sum and
        # ratio is BIGINT, so no decimal/float ever accumulates
        (F.col(value_col).cast("decimal(18,6)") * 1_000_000)
        .cast("long")
        .alias("vm"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    # ^ one explicit round-robin exchange (r9): obs and the cell
    # generator both consume base (shared boundary, computed once), and
    # without it the B × rows md5 stage runs at single-file scan
    # parallelism
    obs = base.groupBy().agg(
        F.sum("vm").cast("long").alias("s_all"),
        F.count(F.lit(1)).cast("long").alias("n_all"),
    )
    u = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("rid"), F.col("b"))), 1, 15),
        16,
        10,
    ).cast("long")
    cells = base.select(
        "rid",
        "vm",
        F.explode(F.sequence(F.lit(0), F.lit(reps - 1)).cast("array<int>")).alias(
            "b"
        ),
    ).select("b", "vm", _pois1_weight(u).alias("w"))
    per_rep = cells.groupBy("b").agg(
        F.sum(F.col("vm") * F.col("w")).cast("long").alias("sw"),
        F.sum("w").cast("long").alias("nw"),
    )
    means = per_rep.select(
        "b", F.expr("sw div nw").cast("long").alias("m_micro")
    ).where(F.col("m_micro").isNotNull())
    # ^ guard the all-zero-weight replicate edge case (r9 ADVICE): a
    # replicate whose every cell drew w = 0 yields (sw=0, nw=0) and a
    # NULL mean; unguarded, that row ranks in its own isNotNull=false
    # window partition where rk==1 can satisfy the lo/hi rank filters
    # (b_reps counts the SAME partition) and duplicate the 1-row
    # readout through the crossJoins. Astronomically unlikely
    # (P ≈ e^{-n} per replicate) and a no-op on any real input, but
    # the old groupBy+join form simply produced no row for it.
    w_rank = Window.partitionBy(F.col("m_micro").isNotNull()).orderBy(
        "m_micro", "b"
    )
    ranked = means.select(
        F.col("m_micro"),
        F.row_number().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.col("m_micro").isNotNull())
        ).alias("b_reps"),
    )
    lo = ranked.filter(
        F.col("rk") == F.expr("(25 * b_reps + 999) div 1000")
    ).select(
        F.col("b_reps"), F.col("m_micro").alias("ci_lo_micro")
    )
    hi = ranked.filter(
        F.col("rk") == F.expr("(975 * b_reps + 999) div 1000")
    ).select(F.col("m_micro").alias("ci_hi_micro"))
    return (
        obs.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.col("b_reps").cast("long").alias("b_reps"),
            F.col("n_all").alias("n"),
            F.expr("s_all div n_all").cast("long").alias("mean_micro"),
            "ci_lo_micro",
            "ci_hi_micro",
        )
    )

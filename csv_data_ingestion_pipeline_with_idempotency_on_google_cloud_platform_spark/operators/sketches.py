"""Frequent-items sketching: Misra-Gries heavy hitters over corpus
terms — the third classical mergeable sketch alongside HLL distinct
counts and GK quantiles (plans/queries.py:approx_distinct /
approx_quantiles).

Why a sketch when `top_terms` already ranks exactly: the exact path
shuffles every distinct term. At 100 TB of web text the term universe
is billions of mostly-once strings — the shuffle is dominated by the
long tail that can never be a top term. Misra-Gries keeps k counters
per partition (k terms + counts, bytes), so the only thing that ever
crosses the wire is num_partitions × k candidate rows, independent of
corpus or vocabulary size.

Guarantees (standard MG, summed over partition summaries):
- est_count <= true_count  (counts are only ever undercounted)
- true_count - est_count <= max_undercount, where max_undercount is
  the exact total decrement mass Σ_p (n_p - Σ c_p)/(k+1)
- every term with true_count > max_undercount is present — so with
  uniform partitions any term above N/(k+1) in frequency survives.

Reference scope: extension X9/X11 (SURVEY.md §2b) — the reference has
no analytics surface at all; this generalizes its per-file counting
(main.py:120-137) the same way the other sketches do.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from ..utils import parallelize_narrow

_SUMMARY_DDL = "term STRING, c BIGINT, pid INT, n_part BIGINT, sum_c BIGINT"


def _mg_partition(k: int):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counters: dict[str, int] = {}
        n = 0
        # NOTE on vectorization (r10, VERDICT r9 item 9): exact MG is
        # ORDER-DEPENDENT — the surviving counter set depends on when
        # each decrement round fires relative to each arrival — and
        # est_count (a declared query output) sums those counters, so a
        # value_counts-style batch update would change declared results.
        # The loop stays sequential by semantics; the cheap exact win is
        # iterating a materialized Python list (one bulk unbox per
        # Arrow batch) instead of boxing pandas scalars element-wise,
        # and dict.get over two hash probes per present term.
        for pdf in it:
            terms = pdf["term"].tolist()
            n += len(terms)
            for t in terms:
                c = counters.get(t)
                if c is not None:
                    counters[t] = c + 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    dead = []
                    for key in counters:
                        if counters[key] == 1:
                            dead.append(key)
                        else:
                            counters[key] -= 1
                    for key in dead:
                        del counters[key]
        sum_c = sum(counters.values())
        # a term=NULL marker row per partition carries (n_part, sum_c)
        # even when every counter cancelled to zero — without it an
        # all-tail partition's decrement mass would vanish from the
        # error bound
        yield pd.DataFrame(
            {
                "term": [None] + list(counters),
                "c": [0] + list(counters.values()),
                "pid": pid,
                "n_part": n,
                "sum_c": sum_c,
            }
        )

    return fn


def frequent_terms(
    docs: DataFrame,
    k: int = 64,
    text_col: str = "text",
    min_share: float | None = None,
) -> DataFrame:
    """(term, est_count, max_undercount): Misra-Gries heavy-hitter
    candidates over lowercased whitespace terms.

    One narrow pass (tokenize → per-partition sketch via Arrow-batched
    mapInPandas) + one tiny shuffle of ≤ partitions×k summary rows.
    `min_share` keeps only terms that could still hold that share of
    total occurrences (filter on est + max_undercount — sound: no
    false negatives; verify survivors exactly if exactness matters).
    """
    terms = parallelize_narrow(
        docs.select(F.explode(tokens_col(text_col)).alias("t"))
    ).select(F.lower("t").alias("term"))
    # materialize the summaries ONCE (partitions x (k+1) tiny rows):
    # both the error-bound branch and the per-term estimate branch
    # hang off this subtree, and mapInPandas is not an exchange, so
    # without the checkpoint the full tokenize+sketch corpus pass
    # would execute twice
    summaries = terms.mapInPandas(
        _mg_partition(k), schema=_SUMMARY_DDL
    ).localCheckpoint(eager=True)

    # exact total decrement mass: each MG decrement round at k full
    # counters absorbs k+1 occurrences, so a partition that processed
    # n_p rows and retained sum_c counts performed (n_p-sum_c)/(k+1)
    # rounds, each able to undercount any term by 1
    bound = (
        summaries.select("pid", "n_part", "sum_c")
        .distinct()
        .agg(
            F.floor(
                F.sum((F.col("n_part") - F.col("sum_c")) / F.lit(k + 1))
            ).cast("bigint").alias("max_undercount"),
            F.sum("n_part").cast("bigint").alias("n_total"),
        )
    )
    est = (
        summaries.filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.sum("c").cast("bigint").alias("est_count"))
    )
    out = est.crossJoin(F.broadcast(bound))
    if min_share is not None:
        out = out.filter(
            F.col("est_count") + F.col("max_undercount")
            >= F.lit(min_share) * F.col("n_total")
        )
    return out.select("term", "est_count", "max_undercount")


# 2^60 — the KMV hash domain size. A power of two, so the double
# literal is exact and the normalization divide is a deterministic
# IEEE op on identical operands in any engine.
_KMV_DOMAIN = float(1 << 60)


def _hash60(col) -> "F.Column":
    """First 60 bits of md5 as a non-negative BIGINT — the same
    engine-agnostic uniform hash family as sampling.hash_bucket_col
    (15 hex chars always fit a long, so no sign/overflow seam)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group K-Minimum-Values distinct-count estimate next to the
    exact count — the mergeable cardinality sketch whose entire state
    is k longs per group (Bar-Yossef et al. 2002: with R = the k-th
    smallest of uniformly hashed distinct keys, E[(k-1)/R] = n).

    Why KMV when `approx_distinct` (HLL) exists: HLL register layout
    is engine-private, so its estimates can only be rows-only checked;
    KMV is pure md5 + k-smallest + one divide — bit-identical in any
    engine, which makes the SKETCH itself oracle-verifiable, and its
    k-min synopsis doubles as a distinct-value sample for downstream
    set operations (union/intersection estimates compose by merging
    synopses and re-taking the k smallest).

    Scale shape: one map-side-combined dedup groupBy on
    (group, hash60) — identical keys collapse per partition before
    the shuffle — then the k-smallest selection runs in the window
    sort of THAT deduped table (|distinct| rows, not |input| rows).
    Groups with < k distinct keys report their exact cardinality
    (KMV is exact below its capacity, k_used < k ⇒ synopsis = the
    whole hash set).

    Output: (group, n_distinct, k_used, est_distinct, err_permille).
    """
    from pyspark.sql import Window

    dedup = (
        df.where(F.col(group_col).isNotNull() & F.col(key_col).isNotNull())
        .select(F.col(group_col).alias("g"), _hash60(F.col(key_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("h")
    wg = Window.partitionBy("g")
    kept = dedup.select(
        "g",
        "h",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("nd"),
    ).filter(F.col("rn") <= k)
    agg = kept.groupBy("g").agg(
        F.max("h").alias("kth"),
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("nd").cast("long").alias("n_distinct"),
    )
    est = F.when(
        F.col("k_used") < k, F.col("n_distinct").cast("double")
    ).otherwise(
        (F.col("k_used") - 1).cast("double")
        * F.lit(_KMV_DOMAIN)
        / F.col("kth").cast("double")
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_distinct",
        "k_used",
        F.round(est, 3).alias("est_distinct"),
        F.round(
            (est - F.col("n_distinct").cast("double"))
            * 1000.0
            / F.col("n_distinct").cast("double"),
            3,
        ).alias("err_permille"),
    )


def kmv_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    k: int = 256,
) -> DataFrame:
    """Re-aggregable distinct counts: daily KMV synopses rolled up to
    weekly estimates — the cube problem COUNT(DISTINCT) famously
    cannot solve (distinct counts don't add across days; synopses
    do). Because the k-min of a union of per-day k-mins IS the k-min
    of the union, the weekly estimate computed from daily synopses is
    IDENTICAL to one computed from raw weekly data (pinned in
    tests/test_sketches_kmv_cm.py) — so a deployment stores k longs
    per (day, slice) and answers any coarser granularity later
    without rescanning.

    Scale shape: one (day, hash) dedup groupBy, a per-day rank window
    over |distinct-per-day| rows, then the weekly merge ranks at most
    k×7 synopsis rows per week. The exact weekly census rides along
    as the witness. Output per week: (week, n_distinct, k_used,
    est_distinct, err_permille).
    """
    from pyspark.sql import Window

    base = df.where(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
    dedup_day = base.select(
        F.to_date(F.col(ts_col)).alias("day"),
        _hash60(F.col(key_col)).alias("h"),
    ).distinct()
    wd = Window.partitionBy("day").orderBy("h")
    day_syn = (
        dedup_day.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    merged = day_syn.select(
        F.date_trunc("week", F.col("day")).cast("date").alias("week"), "h"
    ).distinct()
    ww = Window.partitionBy("week").orderBy("h")
    wk = merged.withColumn("rn", F.row_number().over(ww)).filter(
        F.col("rn") <= k
    )
    agg = wk.groupBy("week").agg(
        F.max("h").alias("kth"),
        F.count(F.lit(1)).cast("long").alias("k_used"),
    )
    exact = (
        base.select(
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("week"),
            F.col(key_col).alias("key"),
        )
        .distinct()
        .groupBy("week")
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
    )
    joined = agg.join(F.broadcast(exact), "week")
    est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(
        (F.col("k_used") - 1).cast("double")
        * F.lit(_KMV_DOMAIN)
        / F.col("kth").cast("double")
    )
    return joined.select(
        "week",
        "n_distinct",
        "k_used",
        F.round(est, 3).alias("est_distinct"),
        F.round(
            (est - F.col("n_distinct").cast("double"))
            * 1000.0
            / F.col("n_distinct").cast("double"),
            3,
        ).alias("err_permille"),
    )


def kmv_set_ops(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
    k: int = 256,
) -> DataFrame:
    """Distinct-set overlap estimated from two K-Minimum-Values
    synopses (Beyer et al. 2007): merge the per-side k-min sets,
    re-take the k smallest, and read Jaccard off the fraction of the
    merged synopsis present in BOTH sides — |A∩B| ≈ J * |A∪B| without
    ever joining the inputs.

    This is the composability payoff of KMV over HLL: the same k
    longs that estimate a side's cardinality answer
    union/intersection/containment questions later — e.g. "how big is
    this join's key overlap" BEFORE paying for the join. Exact
    distinct counts and the exact intersection ride along to witness
    the estimator (production reads the synopses alone).

    Scale shape: each side is one map-side-combined distinct + a
    global k-smallest TakeOrderedAndProject (k rows to the driver
    stage, never the key universe); everything after operates on
    <= 2k-row frames. The exact-witness pass adds one broadcast-able
    distinct-semi-join census. Below capacity (k_used < k) the merged
    synopsis IS the union hash set, so every output is exact.

    Output 1 row: (n_a, n_b, n_inter_exact, k_used, est_union,
    est_inter, err_permille vs the exact intersection).
    """
    ha = (
        df_a.where(F.col(key_a).isNotNull())
        .select(_hash60(F.col(key_a)).alias("h"))
        .distinct()
    )
    hb = (
        df_b.where(F.col(key_b).isNotNull())
        .select(_hash60(F.col(key_b)).alias("h"))
        .distinct()
    )
    sa = ha.orderBy("h").limit(k).select(F.col("h").alias("h_a"))
    sb = hb.orderBy("h").limit(k).select(F.col("h").alias("h_b"))
    merged = (
        sa.select(F.col("h_a").alias("h"))
        .union(sb.select(F.col("h_b").alias("h")))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    in_both = (
        merged.join(F.broadcast(sa), merged["h"] == sa["h_a"], "left_semi")
        .join(F.broadcast(sb), merged["h"] == sb["h_b"], "left_semi")
    )
    syn = merged.groupBy().agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).cast("long").alias("k_used")
    )
    matches = in_both.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_match")
    )
    counts = ha.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    counts_b = hb.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    inter = (
        ha.join(hb, "h", "left_semi")
        .groupBy()
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter_exact"))
    )
    row = (
        syn.crossJoin(F.broadcast(matches))
        .crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(counts_b))
        .crossJoin(F.broadcast(inter))
    )
    est_union = F.when(
        F.col("k_used") < k,
        F.col("k_used").cast("double"),
    ).otherwise(
        (F.col("k_used") - 1).cast("double")
        * F.lit(_KMV_DOMAIN)
        / F.col("kth").cast("double")
    )
    est_inter = F.when(
        F.col("k_used") < k, F.col("n_match").cast("double")
    ).otherwise(
        F.col("n_match").cast("double")
        / F.col("k_used").cast("double")
        * est_union
    )
    return row.select(
        "n_a",
        "n_b",
        "n_inter_exact",
        "k_used",
        F.round(est_union, 3).alias("est_union"),
        F.round(est_inter, 3).alias("est_inter"),
        F.round(
            F.when(
                F.col("n_inter_exact") > 0,
                (est_inter - F.col("n_inter_exact").cast("double"))
                * 1000.0
                / F.col("n_inter_exact").cast("double"),
            ).otherwise(F.lit(0.0)),
            3,
        ).alias("err_permille"),
    )


def countmin_cells(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(j, bucket) cell projection shared by the batch sketch and its
    streaming twin (streaming/sketch_stream.py) — one definition so
    the hash family cannot drift between the two. Null keys drop (a
    null hashes to a null cell)."""
    key = F.col(key_col).cast("string")
    return df.where(F.col(key_col).isNotNull()).select(
        F.posexplode(
            F.array(
                *[
                    (_hash60(F.concat(F.lit(f"{j}:"), key)) % width).alias(
                        f"b{j}"
                    )
                    for j in range(depth)
                ]
            )
        ).alias("j", "bucket")
    )


def countmin_freq(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    probe_top: int = 20,
) -> DataFrame:
    """Count-Min frequency sketch (Cormode & Muthukrishnan 2005) over
    a high-cardinality key, probed at the exact heavy hitters so the
    one-sided overcount guarantee (est >= exact, always) is visible
    in the output.

    Scale shape: the d×w counter table is built by posexploding each
    row into its `depth` (row, bucket) cells and groupBy-counting —
    the explode multiplies rows BEFORE the map-side combine, so each
    partition's partial is at most d×w cells and the shuffle carries
    ≤ partitions × d × w rows no matter how many input rows or
    distinct keys exist. That is the sketch's point: frequency
    estimates for an unbounded key universe in fixed d×w longs,
    mergeable across partitions/streams by cell-wise addition. The
    probe side broadcasts the 1024-row counter table against the
    top-`probe_top` exact counts (the exact pass exists here to
    WITNESS the bound; production reads the sketch alone).

    Buckets are hash60(j || ':' || key) % width — d independent rows
    of the same md5 family, bit-identical in any engine.

    Output: (key, exact_cnt, est_cnt, overcount), overcount >= 0.
    """
    df = df.where(F.col(key_col).isNotNull())
    counters = countmin_cells(df, key_col, depth, width).groupBy(
        "j", "bucket"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    exact = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )
    # TakeOrderedAndProject, not a single-partition window: the probe
    # set is a deterministic (count desc, key) top-N of the exact
    # census, selected as partition-local heaps + a probe_top-row merge.
    probes = exact.orderBy(F.col("exact_cnt").desc(), F.col("key")).limit(
        probe_top
    )
    probe_cells = probes.select(
        "key",
        "exact_cnt",
        F.posexplode(
            F.array(
                *[
                    (
                        _hash60(
                            F.concat(F.lit(f"{j}:"), F.col("key").cast("string"))
                        )
                        % width
                    ).alias(f"b{j}")
                    for j in range(depth)
                ]
            )
        ).alias("j", "bucket"),
    )
    est = (
        probe_cells.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("key", "exact_cnt")
        .agg(F.min("c").cast("long").alias("est_cnt"))
    )
    return est.select(
        F.col("key").alias(key_col),
        "exact_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
    )


def histogram_quantile_rollup(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    bins: int = 128,
    q_milli: int = 500,
) -> DataFrame:
    """Re-aggregable quantiles: per-(group, day) fixed-bin histograms
    rolled up to weekly quantile estimates — the KMV story (X49) for
    ORDER STATISTICS. Exact quantiles don't merge across days; equal-
    width histograms merge by plain vector addition, so a deployment
    stores ≤`bins` longs per (day, slice) and answers any coarser
    granularity later without rescanning raw data.

    Everything is integer: values quantize to cents, the bin index is
    ((cents−lo)·B) div span against GLOBAL min/max (one 1-row aggregate
    broadcast back — fixed edges are what makes day histograms
    mergeable), the target rank is the conformal-style ceil index
    r = (q·n + 999) div 1000, and the in-bin interpolation is a closed
    integer formula both engines state verbatim. The exact weekly
    quantile rides along as witness: the output carries estimate,
    exact, and signed error in cents.

    Scale shape: daily histogram = ONE map-side-combined groupBy
    (≤ groups×days×B rows ever shuffle); weekly merge + CDF windows
    run on the AGGREGATED table (≤ B rows per group-week). The exact
    witness is the only per-row sort, and at 100 TB it is exactly the
    thing the synopsis exists to avoid — kept here to measure error,
    dropped in deployment.

    Returns (group, week, n, est_cents, exact_cents, err_cents).
    """
    from pyspark.sql import Window

    base = df.where(
        F.col(group_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("week"),
        F.to_date(F.col(ts_col)).alias("day"),
        F.floor(F.col(value_col).cast("decimal(18,6)") * 100)
        .cast("long")
        .alias("cents"),
    )
    bounds = base.agg(
        F.min("cents").alias("__lo"), F.max("cents").alias("__hi")
    )
    b = base.crossJoin(F.broadcast(bounds)).withColumn(
        "span", F.expr("__hi - __lo + 1")
    )
    binned = b.withColumn(
        "bin", F.expr(f"((cents - __lo) * {bins}) div span")
    )
    # the stored synopsis: per (g, day, bin) counts with the shared edges
    daily = binned.groupBy(
        "g", "week", "day", "bin", "__lo", "span"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # the merge: histograms add — this is the whole point
    weekly = daily.groupBy("g", "week", "bin", "__lo", "span").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    w_all = Window.partitionBy("g", "week")
    w_cdf = w_all.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = weekly.select(
        "g",
        "week",
        "bin",
        "cnt",
        "__lo",
        "span",
        F.sum("cnt").over(w_cdf).cast("long").alias("cum"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    ).withColumn("r", F.expr(f"({q_milli} * n + 999) div 1000"))
    hit = cdf.filter(
        (F.col("cum") >= F.col("r")) & (F.col("cum") - F.col("cnt") < F.col("r"))
    )
    est = F.expr(
        f"__lo + (((bin * 1000 + ((1000 * (r - (cum - cnt))) div cnt))"
        f" * span) div (1000 * {bins}))"
    )
    est_df = hit.select(
        "g", "week", "n", est.cast("long").alias("est_cents")
    )
    # exact witness: the same ceil-rank order statistic on raw cents
    w_rank = Window.partitionBy("g", "week").orderBy("cents")
    exact = (
        base.select(
            "g",
            "week",
            "cents",
            F.row_number().over(w_rank).alias("rk"),
            F.count(F.lit(1)).over(w_all).alias("n_all"),
        )
        .filter(F.col("rk") == F.expr(f"({q_milli} * n_all + 999) div 1000"))
        .select("g", "week", F.col("cents").alias("exact_cents"))
    )
    return (
        est_df.join(exact, ["g", "week"])
        .select(
            F.col("g").alias(group_col),
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            "n",
            "est_cents",
            "exact_cents",
            (F.col("est_cents") - F.col("exact_cents")).alias("err_cents"),
        )
    )

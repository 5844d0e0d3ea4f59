"""Deterministic sampling / dataset-split operators.

Training-data pipelines need *reproducible* splits: the same document
must land in the same split on every run, on every cluster, regardless
of partitioning — which rules out ``df.sample`` (seed + partition
dependent). The standard fix is content/key hashing: split membership
is a pure function of a stable key.

This generalizes the reference's content-addressed identity idea
(``main.py:15-18``: sha256 of file identity decides dedup fate) to
decide *split* fate. md5 is used (not sha2) because every engine in the
stack (Spark, DuckDB, Python hashlib) produces the identical lowercase
hex digest, making the split oracle-checkable bit-for-bit.

Scale: embarrassingly parallel — a narrow projection, no shuffle, no
driver state. The hex-prefix threshold compare keeps everything in
string space (no hex→int conversion, which DuckDB lacks a portable
builtin for).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket_col(key: Column | str, prefix_len: int = 8) -> Column:
    """Uniform [0,1)-ish bucket as a zero-padded hex-prefix string of
    md5(key). String-ordered comparison against a hex literal selects a
    deterministic fraction: ``hash < '1a'`` keeps 0x1a/0x100 ≈ 10.2%."""
    return F.substring(F.md5(F.col(key).cast("string") if isinstance(key, str) else key.cast("string")), 1, prefix_len)


def hash_split(
    df: DataFrame,
    key: str,
    holdout_below: str = "1a",
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic train/holdout split column.

    ``holdout_below`` is a lowercase-hex threshold compared against the
    md5-prefix of the key: e.g. ``"1a"`` ≈ 10.2% holdout, ``"0a"`` ≈
    3.9%. Same key ⇒ same split, forever, in any engine.
    """
    n = len(holdout_below)
    return df.withColumn(
        split_col,
        F.when(hash_bucket_col(key, n) < F.lit(holdout_below), F.lit("holdout")).otherwise(
            F.lit("train")
        ),
    )


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    keep_below: dict[str, str],
    default_below: str = "ff",
) -> DataFrame:
    """Per-stratum deterministic downsampling (e.g. downweight a
    dominant language in a corpus): keep a row iff its md5-prefix is
    below the stratum's hex threshold. Pure filter — no shuffle, no
    sampling state; thresholds compose with `hash_split` because both
    read the same hash."""
    thresholds = F.create_map(
        *[F.lit(x) for kv in keep_below.items() for x in kv]
    )
    limit = F.coalesce(thresholds[F.col(stratum)], F.lit(default_below))
    return df.filter(hash_bucket_col(key, 2) < limit)


def weighted_sample(
    df: DataFrame,
    key: str,
    weight: Column | str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (top-k of
    the corpus with inclusion probability ∝ weight): the exponential-
    key method (Efraimidis–Spirakis A-ES). Each row gets rank key
    ``e = -ln(u)/w`` — an Exp(w) draw — and the k smallest win.

    ``u`` is not random: it is the md5 hex prefix of the row key mapped
    to (0,1), so the "draw" is a pure function of the key — the same
    sample on every run and every engine (the property everything else
    in this module guarantees). Rows with weight ≤ 0 are excluded (an
    Exp(w) key is undefined there and would otherwise always win).

    Scale: narrow projection + ``orderBy().limit(k)`` →
    TakeOrderedAndProject (per-partition top-k, k-row driver merge) —
    no global sort, no shuffle of the losers.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    u32 = F.conv(hash_bucket_col(key, 8), 16, 10).cast("long")
    u = (u32 + F.lit(0.5)) / F.lit(float(1 << 32))  # (0,1), never 0
    ekey = -F.log(u) / w.cast("double")
    return (
        # rows with non-positive weight are ineligible (their Exp(w)
        # key would be negative/undefined and silently always win)
        df.filter(w.cast("double") > 0)
        .withColumn("samp_key", F.round(ekey, 8))
        .orderBy(F.asc("samp_key"), F.asc(key))
        .limit(k)
    )


def temperature_mix(
    df: DataFrame,
    key: str = "doc_id",
    stratum: str = "lang",
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-based data mixing: deterministically downsample so
    the kept corpus's stratum composition follows q_s ∝ p_s^(1/T) —
    the standard multilingual rebalancing (T>1 flattens toward uniform,
    upweighting low-resource strata; T=1 keeps everything).

    Rates are solved so composition is exact WITHOUT upsampling: keep
    rate r_s = C·q_s/n_s with C = min_s(n_s/q_s), i.e. the largest
    corpus whose composition is exactly q. Rate derivation runs as
    three aggregations over the per-stratum counts (|strata| rows —
    broadcast everywhere); membership is the same md5-prefix pure
    function as hash_split, so the sample is reproducible on any
    engine and composes with split/downsample thresholds. One narrow
    scan + one count shuffle of |strata| partial rows; no driver state.

    Returns the kept rows with `mix_rate` attached.
    """
    counts = df.groupBy(stratum).agg(F.count("*").alias("__n"))
    # rate algebra over the |strata|-row counts frame: windows over one
    # constant-keyed partition (non-foldable so the spec survives
    # optimization) — |strata| rows, so the single partition is free.
    # The key must be constant even when a NULL stratum exists (its
    # count row participates in normalization like any other stratum),
    # so key on the always-true count predicate, not stratum nullity.
    from pyspark.sql import Window

    wall = Window.partitionBy(F.col("__n") >= 0)
    q_raw = F.pow(F.col("__n") / F.sum("__n").over(wall), 1.0 / temperature)
    tmp = counts.select(stratum, "__n", q_raw.alias("__q_raw"))
    tmp = tmp.select(
        stratum, "__n", (F.col("__q_raw") / F.sum("__q_raw").over(wall)).alias("__q")
    )
    rates = tmp.select(
        stratum,
        F.least(
            F.min(F.col("__n") / F.col("__q")).over(wall)
            * F.col("__q")
            / F.col("__n"),
            F.lit(1.0),
        ).alias("mix_rate"),
    )
    # null-safe join: a NULL stratum is a real stratum (unclassified
    # docs) — a plain equi-join would silently drop every such row
    rates = rates.withColumnRenamed(stratum, "__stratum")
    out = df.join(
        F.broadcast(rates), F.col(stratum).eqNullSafe(F.col("__stratum"))
    ).drop("__stratum")
    thr = F.format_string(
        "%08x", F.floor(F.col("mix_rate") * F.lit(float(1 << 32))).cast("long")
    )
    keep = (F.col("mix_rate") >= 1.0) | (hash_bucket_col(key, 8) < thr)
    return out.filter(keep)


def kfold_assign(
    df: DataFrame,
    key: str,
    k: int = 5,
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: fold = first-8-hex of md5(key)
    mod k. Same key ⇒ same fold in any engine, forever — so folds
    survive re-runs, engine swaps, and cluster resizes, and fold
    membership never depends on partitioning. Narrow projection,
    zero shuffle (the cross-validation twin of hash_split)."""
    h = F.substring(
        F.md5(F.col(key).cast("string") if isinstance(key, str) else key.cast("string")),
        1,
        8,
    )
    return df.withColumn(fold_col, (F.conv(h, 16, 10).cast("bigint") % k).cast("int"))


def budget_select(
    scored: DataFrame,
    budget: int,
    score_col: str = "quality_score",
    cost_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy token-budget subset selection: take documents in
    descending `score_col` order (ties to the lower id) until the
    cumulative `cost_col` would exceed `budget` — the "best corpus
    that fits the training budget" primitive behind data-constrained
    scaling recipes.

    The cumulative sum needs a total order over ALL candidates, so the
    running total is computed the same way assign_global_ids ranks:
    range-partition by the (negated score, id) key, per-partition
    partial sums, broadcast prefix offsets — never a single-partition
    window. Here the partial sums come from one extra per-partition
    aggregate (partitions × 1 longs to the driver, the bounded class).
    Greedy-prefix semantics: a document is kept iff its INCLUSIVE
    running cost ≤ budget, so selection stops at the first overflow —
    one oversized document ends the prefix even if smaller documents
    behind it would still fit. Skip-and-continue would pack tighter
    but is knapsack-shaped and order-dependent; the prefix form is the
    deterministic, oracle-checkable contract (and the standard
    data-budget recipe: rank, then cut).
    """
    keyed = scored.select(
        id_col,
        score_col,
        cost_col,
        F.struct(
            (-F.col(score_col)).alias("k"), F.col(id_col).alias("u")
        ).alias("__k"),
    )
    p = (
        keyed.repartitionByRange(32, F.col("__k"))
        .sortWithinPartitions("__k")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # per-partition cost totals -> exclusive prefix offsets (broadcast)
    totals = (
        p.groupBy("__pid").agg(F.sum(cost_col).alias("t")).orderBy("__pid").collect()
    )
    offsets, running = {}, 0
    for row in totals:
        offsets[row["__pid"]] = running
        running += row["t"] or 0
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w_local = Window.partitionBy("__pid").orderBy("__k")
    cum = off[F.col("__pid")] + F.sum(cost_col).over(w_local)
    return (
        p.withColumn("cum_cost", cum.cast("long"))
        .filter(F.col("cum_cost") <= budget)
        .select(id_col, score_col, cost_col, "cum_cost")
    )


def class_weights(
    df: DataFrame, label_col: str = "lang", weight_col: str = "class_weight"
) -> DataFrame:
    """Balanced inverse-frequency class weights — sklearn's
    'balanced' recipe: weight(c) = n_total / (n_classes · n_c), so a
    uniformly weighted loss sees every class equally. One map-side-
    combined groupBy over the label (null label = a real class), the
    totals derived from the ≤|classes|-row aggregate itself (window
    over the tiny frame, no second scan). Returns one row per class;
    broadcast-join it back to rows at train time."""
    counts = df.groupBy(label_col).agg(F.count("*").alias("n"))
    # n % 1: constant-valued but non-foldable partition key — the
    # window input is the ≤|classes|-row aggregate (single tiny
    # partition by intent); a bare literal would constant-fold to an
    # empty spec and trip the single-partition WindowExec warning
    # (same trick as similarity._rank_topk)
    wall = Window.partitionBy(F.col("n") % 1)
    return counts.select(
        label_col,
        F.col("n").alias("n_rows"),
        F.round(
            F.sum("n").over(wall)
            / (F.count("*").over(wall) * F.col("n")),
            6,
        ).alias(weight_col),
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    budget: int = 1000,
) -> DataFrame:
    """Optimal (Neyman) allocation of a sampling budget across strata:
    n_h proportional to N_h*sigma_h - the survey-sampling rule that minimizes the
    variance of the estimated mean for a fixed total sample size. The
    eval-set construction primitive: spend labeling budget where the
    metric is NOISY, not just where data is plentiful (proportional
    allocation over-samples big homogeneous strata).

    One map-side-combined groupBy computes exact DECIMAL moments per
    stratum; sigma is the only float (closed form from exact sums, same
    IEEE expression in the oracle), then quantized to milli so the
    share arithmetic - window total, (budget * w_h) div W - is exact
    BIGINT and the floor boundary cannot drift. Zero-variance and
    singleton strata get weight 0 (nothing to learn from sampling
    inside them beyond one row).

    Returns (stratum, n_rows, sigma_milli, alloc); sum(alloc) <= budget
    by floor rounding.
    """
    moments = (
        df.where(F.col(stratum_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            F.col(stratum_col).alias("stratum"),
            F.col(value_col).cast("decimal(18,6)").alias("v"),
        )
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("v").alias("s"),
            F.sum(F.col("v") * F.col("v")).alias("ss"),
        )
    )
    var = F.when(
        F.col("n_rows") >= 2,
        (
            F.col("n_rows").cast("double") * F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / (
            F.col("n_rows").cast("double")
            * (F.col("n_rows") - 1).cast("double")
        ),
    ).otherwise(F.lit(0.0))
    sized = moments.select(
        "stratum",
        "n_rows",
        F.floor(F.sqrt(F.greatest(var, F.lit(0.0))) * 1000.0)
        .cast("long")
        .alias("sigma_milli"),
    ).withColumn("wt", F.col("n_rows") * F.col("sigma_milli"))
    # NB: names "w"/"W" would collide — Spark resolves columns
    # case-insensitively by default, so withColumn("W") silently
    # REPLACES "w" and every share becomes 100%
    # n_rows % 1 (not isNotNull): count() is non-nullable, so
    # isNotNull(n_rows) constant-folds to a literal and the window
    # spec goes empty — the single-partition WindowExec warning on
    # every bench pass. The modulo stays non-foldable.
    w_tot = Window.partitionBy(F.col("n_rows") % 1)
    return (
        sized.withColumn("wtot", F.sum("wt").over(w_tot))
        .select(
            "stratum",
            "n_rows",
            "sigma_milli",
            F.when(F.col("wtot") > 0, F.expr(f"({budget} * wt) div wtot"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("alloc"),
        )
    )


def group_reservoir_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Deterministic k-per-group uniform sample: rank rows inside each
    group by md5(id) — a fixed pseudo-random permutation — and keep the
    k smallest. The distributed answer to "give me k examples from
    every source/language/label" that reservoir sampling gives a
    single machine: one window per group key (groups partition across
    executors; no global sort, no collect), reproducible across runs
    and engines because the permutation is the hash, not an RNG.

    Ties cannot occur (md5 of distinct ids is distinct far beyond any
    realistic id space); rows with NULL id are excluded. Returns the
    input columns plus `sample_rank` (1-based).
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.where(F.col(id_col).isNotNull())
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    holdout_below: str = "1a",
) -> DataFrame:
    """Train/holdout split that cannot leak near-duplicates across the
    boundary: the split key is the doc's near-dup CLUSTER id, not the
    doc id, so every member of a duplicate cluster lands on the same
    side. Splitting by doc hash puts ~2·p·(1−p) of each near-dup pair
    across the boundary — the classic eval-contamination bug that
    silently inflates held-out metrics; keying on the component id
    (near_dup_clusters output) removes it by construction.

    `clusters` is (node_id, cluster_id, ...) from near_dup_clusters;
    docs absent from it are singletons (their own cluster). One
    broadcast-or-keyed left join + the same md5-prefix threshold as
    hash_split. Returns (id, cluster_id, split).
    """
    lut = clusters.select(
        F.col("node_id").alias(id_col), F.col("cluster_id").alias("__cl")
    )
    return (
        docs.select(id_col)
        .join(lut, id_col, "left")
        .select(
            id_col,
            F.coalesce("__cl", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn(
            "split",
            F.when(
                hash_bucket_col("cluster_id", len(holdout_below))
                < F.lit(holdout_below),
                F.lit("holdout"),
            ).otherwise(F.lit("train")),
        )
    )


def unimax_weights(
    docs: DataFrame,
    budget_tokens: int,
    max_epochs: int = 4,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """UniMax language-balanced token allocation (Chung et al. 2023,
    "UniMax: Fairer and More Effective Language Sampling for
    Large-Scale Multilingual Pretraining"): spread a total token
    budget as uniformly as possible across languages, but never ask
    any language for more than ``max_epochs`` passes over its corpus —
    the sampling schedule that stops a 100 TB English crawl from
    drowning the tail languages without over-epoching them.

    Closed-form water-filling, no iteration: sort languages by
    capacity (tokens x max_epochs) ascending; the unique threshold t
    with "k smallest languages saturated, the rest at t" satisfies
    cap_k <= t <= cap_{k+1} and is found by comparing
    cap_j * (L-j+1) against budget - prefix_{j-1} — ALL INTEGER
    (cross-multiplied rationals), so the pivot row and every
    allocation are exact in any engine; unsaturated languages get
    floor((budget - prefix)/(remaining)).

    Scale shape: one map-side-combined groupBy on lang computes exact
    token counts; everything after runs on the per-language frame
    (hundreds of rows at worst), where single-partition windows are
    the *correct* choice, not a bottleneck.

    Returns (lang, n_tokens, capacity, alloc, epochs_milli) with
    sum(alloc) <= budget by floor rounding; epochs_milli =
    1000*alloc div n_tokens.
    """
    from ..functions.text import tokens_col

    per_lang = (
        docs.where(F.col(lang_col).isNotNull())
        .select(
            F.col(lang_col).alias("lang"),
            F.size(tokens_col(text_col)).cast("long").alias("tk"),
        )
        .groupBy("lang")
        .agg(F.sum("tk").alias("n_tokens"))
        .withColumn("capacity", F.col("n_tokens") * max_epochs)
    )
    # tiny frame from here on: windows over one partition by design
    part = Window.partitionBy(F.col("capacity").isNotNull())
    w_ord = part.orderBy("capacity", "lang")
    ranked = (
        per_lang.withColumn("rn", F.row_number().over(w_ord))
        .withColumn("l_total", F.count(F.lit(1)).over(part))
        .withColumn("prefix", F.sum("capacity").over(w_ord) - F.col("capacity"))
        .withColumn("prev_cap", F.lag("capacity", 1, 0).over(w_ord))
    )
    b = F.lit(int(budget_tokens)).cast("long")
    t_den = (F.col("l_total") - F.col("rn") + 1).cast("long")
    t_num = b - F.col("prefix")
    valid = (F.col("capacity") * t_den >= t_num) & (
        F.col("prev_cap") * t_den <= t_num
    )
    # inject the integer threshold operands as real columns first
    with_pivot = (
        ranked.withColumn("__tn", t_num)
        .withColumn("__td", t_den)
        .withColumn("pivot_rn", F.min(F.when(valid, F.col("rn"))).over(part))
        .withColumn(
            "t_alloc",
            F.max(
                F.when(F.col("rn") == F.col("pivot_rn"), F.expr("__tn div __td"))
            ).over(part),
        )
    )
    alloc = F.when(
        F.col("pivot_rn").isNull() | (F.col("rn") < F.col("pivot_rn")),
        F.col("capacity"),
    ).otherwise(F.least(F.col("capacity"), F.col("t_alloc")))
    return with_pivot.select(
        "lang",
        "n_tokens",
        "capacity",
        alloc.cast("long").alias("alloc"),
        F.when(F.col("n_tokens") > 0, (F.lit(1000).cast("long") * alloc).cast("long"))
        .otherwise(F.lit(0))
        .alias("__a1000"),
    ).select(
        "lang",
        "n_tokens",
        "capacity",
        "alloc",
        F.expr("__a1000 div n_tokens").cast("long").alias("epochs_milli"),
    )


def time_split_embargo(
    events: DataFrame,
    test_milli: int = 200,
    embargo_s: int = 3600,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Purged TEMPORAL train/test split (round 9): train = everything
    at or before the exact (1000−test_milli)/1000 time-quantile
    cutoff, test = everything after cutoff + ``embargo_s``, and the
    embargo band between them is DROPPED from both sides — the
    finance-style purged split (de Prado 2018, "Advances in Financial
    Machine Learning", ch. 7) that the hash/cluster splits (X8,
    X67) cannot provide: when features aggregate trailing windows, a
    bare temporal cut leaks test-period information into train
    through windows that straddle the boundary; the embargo removes
    exactly those rows.

    Exact and engine-identical: the cutoff is the microsecond VALUE
    at rank ⌈n·(1000−test_milli)/1000⌉ under the timestamp order —
    value-based assignment, so timestamp ties land on one side by
    construction; the target rank is integer arithmetic
    ((n·(1000−test_milli) + 999) div 1000).

    Scale shape: the global order statistic runs on a two-level DAY
    decomposition (the sprt/event_freshness precedent): per-day
    counts cumsum over the tiny day frame to locate the boundary
    day, then tie groups on the distinct timestamps of that ONE day
    find the exact cutoff value — no global sort, no data-scale
    window. Assignment is one broadcast of two literal-sized scalars.

    Returns (id_col, us, split) with split ∈ train/embargo/test.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.where(F.col(ts_col).isNotNull()).select(
        F.col(id_col), us.alias("us")
    )
    day_us = 86_400_000_000
    days = base.groupBy(
        F.floor(F.col("us") / day_us).cast("long").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("__c"))
    wd = Window.partitionBy(F.col("d") % 1).orderBy("d")
    cumd = (
        days.withColumn("cum", F.sum("__c").over(wd))
        .withColumn("n", F.sum("__c").over(Window.partitionBy(F.col("d") % 1)))
        .withColumn(
            "__tgt",
            F.expr(f"(n * (1000 - {int(test_milli)}) + 999) div 1000"),
        )
    )
    bday = cumd.where(
        (F.col("cum") >= F.col("__tgt"))
        & (F.col("cum") - F.col("__c") < F.col("__tgt"))
    ).select(
        "d", (F.col("cum") - F.col("__c")).alias("__prev"), "__tgt"
    )
    # exact cutoff from the boundary day's distinct-timestamp tie
    # groups (bounded by one day's volume)
    wt = Window.partitionBy("d").orderBy("us")
    cutoff = (
        base.withColumn("d", F.floor(F.col("us") / day_us).cast("long"))
        .join(F.broadcast(bday), "d")
        .groupBy("d", "us", "__prev", "__tgt")
        .agg(F.count(F.lit(1)).cast("long").alias("__tc"))
        .withColumn("cumt", F.col("__prev") + F.sum("__tc").over(wt))
        .where(F.col("cumt") >= F.col("__tgt"))
        .agg(F.min("us").cast("long").alias("__cut"))
    )
    emb_us = int(embargo_s) * 1_000_000
    return base.crossJoin(F.broadcast(cutoff)).select(
        id_col,
        F.col("us"),
        F.when(F.col("us") <= F.col("__cut"), F.lit("train"))
        .when(F.col("us") <= F.col("__cut") + F.lit(emb_us), F.lit("embargo"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def length_curriculum(
    docs: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact length-quantile curriculum stages (round 9, X146): assign
    every document to one of ``k`` stages by token count, with stage
    boundaries at the exact ⌈j·n/k⌉ order statistics — the
    shortest-first schedule curriculum trainers feed from (and the
    dual of X10's packing: stages with homogeneous lengths pack with
    less padding). Value-based assignment (stage j ⇔ tc ≤ edge_j), so
    equal-length docs always share a stage — deterministic in any
    engine, no row ranks anywhere.

    Scale shape: token counts collapse to (tc → count) TIE GROUPS
    (map-side combinable; the frame is bounded by the distinct
    token-count RANGE, not the corpus), one cumsum over that frame
    finds all k−1 edges as MIN-value-reaching-rank picks (the
    activation_latency rule), and the 1-row edge frame broadcasts
    back. Rank targets are exact integers: ⌈j·n/k⌉ = (j·n + k − 1)
    div k.

    Returns per-row (id_col, n_tokens, stage) with stage 1..k.
    """
    from ..functions.text import token_count_col

    if k < 2:
        raise ValueError("length_curriculum: k must be >= 2")
    # the tokenized (id, n_tokens) projection feeds BOTH the tie
    # aggregate and the final label pass through one explicit
    # repartition — AQE exchange reuse tokenizes ONCE (the
    # quality_quantile_normalize pattern); the (n_tokens, id) key
    # keeps the exchange skew-free where bare n_tokens would funnel
    # every same-length doc into one partition
    base = (
        docs.where(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
        .select(F.col(id_col), token_count_col(text_col).alias("n_tokens"))
        .repartition(F.col("n_tokens"), F.col(id_col))
    )
    cells = base.groupBy("n_tokens").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    w = Window.partitionBy(F.col("n_tokens") % 1).orderBy("n_tokens")
    wall = Window.partitionBy(F.col("n_tokens") % 1)
    cum = cells.withColumn("cum", F.sum("__c").over(w)).withColumn(
        "n", F.sum("__c").over(wall)
    )
    edges = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"({j} * n + {k} - 1) div {k}"),
                    F.col("n_tokens"),
                )
            )
            .cast("long")
            .alias(f"__e{j}")
            for j in range(1, k)
        ]
    )
    stage = None
    for j in range(1, k):
        cond = F.col("n_tokens") <= F.col(f"__e{j}")
        stage = F.when(cond, j) if stage is None else stage.when(cond, j)
    stage = stage.otherwise(k)
    return base.crossJoin(F.broadcast(edges)).select(
        id_col, "n_tokens", stage.cast("int").alias("stage")
    )

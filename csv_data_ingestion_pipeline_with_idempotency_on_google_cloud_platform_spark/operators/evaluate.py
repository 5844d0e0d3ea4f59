"""Model-evaluation operators: confusion metrics, decile lift, NDCG.

A curation pipeline that trains quality classifiers (classify.py) and
ranking functions (retrieval.py) needs to EVALUATE them at corpus
scale — precision/recall of the quality gate, lift curves for
threshold selection, ranking quality against a relevance signal.
These close that loop as first-class distributed operators.

Determinism contract (the driver value-hashes results): every metric
is either pure integer arithmetic (confusion counts, milli-metrics
via integer division) or a ≤3-decimal rounding of a ≤10-term float
sum — no order-sensitive float aggregation reaches an output column.

Scale shape:
* ``classifier_eval`` — one groupBy over the scored corpus carrying
  four conditional-count partials; metrics derived per group. The
  join back to the dimension column broadcasts nothing and shuffles
  once on the group key.
* ``decile_lift`` — the global score ranking uses
  packing.assign_global_ids (range-partition + broadcast prefix
  offsets, NO single-partition row_number window); deciles come from
  ntile's closed form; the cumulative pass runs over the 10-row
  aggregate (tiny window, non-foldable constant partition key).
* ``ndcg_at_k`` — per-query top-k via a window partitioned by query
  term (parallel across terms), DCG over ≤k rows per term.

No analogue exists in the reference (csv-processor-function/main.py
is ingest glue only); semantics follow the standard IR/ML
definitions (Järvelin & Kekäläinen 2002 for DCG).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def classifier_eval(
    scored: DataFrame,
    group_col: str | None = None,
    pred_col: str = "pred_pos",
    label_col: str = "is_pos",
) -> DataFrame:
    """Confusion counts + precision/recall/F1 (milli-int, exact
    integer division) per ``group_col`` (or one global row).

    Input: one row per example with integer/boolean prediction and
    label columns. Output columns: group, tp, fp, fn, tn,
    precision_milli, recall_milli, f1_milli (0 where undefined —
    sklearn's zero_division=0 convention).
    """
    p = F.col(pred_col).cast("int")
    y = F.col(label_col).cast("int")
    keys = [group_col] if group_col else []
    agg = scored.groupBy(*keys).agg(
        F.sum(p * y).cast("long").alias("tp"),
        F.sum(p * (1 - y)).cast("long").alias("fp"),
        F.sum((1 - p) * y).cast("long").alias("fn"),
        F.sum((1 - p) * (1 - y)).cast("long").alias("tn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.expr("(1000 * tp) div (tp + fp)"),
    ).otherwise(F.lit(0).cast("long"))
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.expr("(1000 * tp) div (tp + fn)"),
    ).otherwise(F.lit(0).cast("long"))
    out = agg.withColumn("precision_milli", prec).withColumn("recall_milli", rec)
    f1 = F.when(
        F.col("precision_milli") + F.col("recall_milli") > 0,
        F.expr(
            "(2 * precision_milli * recall_milli)"
            " div (precision_milli + recall_milli)"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return out.withColumn("f1_milli", f1)


def decile_lift(
    scored: DataFrame,
    score_col: str = "score_milli",
    label_col: str = "is_pos",
    id_col: str = "doc_id",
    n_tiles: int = 10,
) -> DataFrame:
    """Gains/lift table: rank by score descending (id ascending as the
    deterministic tiebreak), split into ``n_tiles`` SQL-ntile-exact
    tiles, report per-tile and cumulative capture + lift in milli-ints.

    lift_milli(t) = 1000 · (cum_pos/cum_n) / (total_pos/total_n),
    computed as (1000·cum_pos·total_n) div (cum_n·total_pos) — exact.
    """
    from .packing import assign_global_ids

    keyed = scored.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("long").alias("__y"),
        F.struct(
            (-F.col(score_col)).cast("long").alias("k"),
            F.col(id_col).alias("u"),
        ).alias("__k"),
    )
    ranked = assign_global_ids(keyed, "__k", id_col="__r")
    n = ranked.count()
    q, r = divmod(n, n_tiles)
    boundary = r * (q + 1)
    i = F.col("__r")
    tile = (
        F.when(i < F.lit(boundary), F.floor(i / F.lit(q + 1)))
        .otherwise(F.lit(r) + F.floor((i - F.lit(boundary)) / F.lit(max(q, 1))))
        + 1
    ).cast("long")
    per_tile = (
        ranked.select(tile.alias("decile"), "__y")
        .groupBy("decile")
        .agg(F.count("*").alias("n_rows"), F.sum("__y").alias("n_pos"))
    )
    # cumulative over the ≤n_tiles-row aggregate; decile % 1 is the
    # non-foldable constant partition key (class_weights convention)
    wall = Window.partitionBy(F.col("decile") % 1).orderBy("decile")
    wtot = Window.partitionBy(F.col("decile") % 1)
    cum = per_tile.select(
        "decile",
        "n_rows",
        "n_pos",
        F.sum("n_rows").over(wall).alias("cum_n"),
        F.sum("n_pos").over(wall).alias("cum_pos"),
        F.sum("n_rows").over(wtot).alias("tot_n"),
        F.sum("n_pos").over(wtot).alias("tot_pos"),
    )
    return cum.select(
        "decile",
        "n_rows",
        "n_pos",
        "cum_pos",
        F.expr("(1000 * cum_pos) div greatest(tot_pos, 1L)").alias(
            "capture_milli"
        ),
        F.expr(
            "(1000 * cum_pos * tot_n) div greatest(cum_n * tot_pos, 1L)"
        ).alias("lift_milli"),
    )


def ndcg_at_k(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    rel_col_expr=None,
    id_col: str = "doc_id",
) -> DataFrame:
    """NDCG@k of the term-frequency ranking against an independent
    relevance signal (default: rel = 1 when lang = 'en').

    For each query term: rank docs containing the term by
    (tf desc, id asc) — integer keys, so the ranking is identical in
    any engine — take the top k, and score
    DCG = Σ rel/log2(pos+1) against the ideal reordering. Output:
    (term, dcg_milli, idcg_milli, ndcg_milli) — DCG is a ≤k-term sum
    rounded to milli, safely inside float reproducibility.
    """
    if rel_col_expr is None:
        rel_col_expr = (F.col("lang") == "en").cast("int")
    lit_terms = F.array(*[F.lit(t) for t in terms])
    # tokenize once per doc (the repo's whitespace-token convention,
    # same as top_terms), then fan out over the literal term list —
    # |terms| is a small constant, so the array duplication is bounded
    toks = docs.select(
        F.col(id_col).alias("__id"),
        rel_col_expr.alias("__rel"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
    ).filter(F.length(F.trim(F.col(text_col))) > 0)
    with_tf = (
        toks.select(
            "__id",
            "__rel",
            "__toks",
            F.explode(lit_terms).alias("term"),
        )
        .select(
            "term",
            "__id",
            "__rel",
            F.expr("size(filter(__toks, x -> x = term))")
            .cast("long")
            .alias("__tf"),
        )
        .filter(F.col("__tf") > 0)
    )
    w_rank = Window.partitionBy("term").orderBy(
        F.col("__tf").desc(), F.col("__id").asc()
    )
    w_ideal = Window.partitionBy("term").orderBy(
        F.col("__rel").desc(), F.col("__id").asc()
    )
    topk = (
        with_tf.withColumn("pos", F.row_number().over(w_rank))
        .withColumn("ideal_pos", F.row_number().over(w_ideal))
        .filter((F.col("pos") <= k) | (F.col("ideal_pos") <= k))
    )
    dcg_term = F.when(
        F.col("pos") <= k, F.col("__rel") / F.log2(F.col("pos") + 1)
    ).otherwise(F.lit(0.0))
    idcg_term = F.when(
        F.col("ideal_pos") <= k, F.col("__rel") / F.log2(F.col("ideal_pos") + 1)
    ).otherwise(F.lit(0.0))
    agg = topk.groupBy("term").agg(
        F.round(1000 * F.sum(dcg_term)).cast("long").alias("dcg_milli"),
        F.round(1000 * F.sum(idcg_term)).cast("long").alias("idcg_milli"),
    )
    return agg.select(
        "term",
        "dcg_milli",
        "idcg_milli",
        F.when(
            F.col("idcg_milli") > 0,
            F.round(1000.0 * F.col("dcg_milli") / F.col("idcg_milli")).cast(
                "long"
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("ndcg_milli"),
    )


def calibration_table(
    scored: DataFrame,
    score_col: str = "score_milli",
    label_col: str = "is_pos",
    id_col: str = "doc_id",
    n_tiles: int = 10,
) -> DataFrame:
    """Calibration table: per score-decile, the mean predicted score
    next to the actual positive rate — the reliability diagram's data.
    A well-calibrated ranker shows the two moving together; a cliff
    between them is exactly what threshold selection needs to see
    before a quality gate ships.

    Same machinery as decile_lift (range-partitioned global ranks →
    closed-form ntile, no single-partition window); both outputs are
    integer divisions of exact long sums, so the table is engine-exact.
    Output: (decile, n_rows, n_pos, mean_score_milli, pos_rate_milli),
    decile 1 = highest scores.
    """
    from .packing import assign_global_ids

    keyed = scored.select(
        F.col(label_col).cast("long").alias("__y"),
        F.col(score_col).cast("long").alias("__s"),
        F.struct(
            (-F.col(score_col)).cast("long").alias("k"),
            F.col(id_col).alias("u"),
        ).alias("__k"),
    )
    ranked = assign_global_ids(keyed, "__k", id_col="__r")
    n = ranked.count()
    q, r = divmod(n, n_tiles)
    boundary = r * (q + 1)
    i = F.col("__r")
    tile = (
        F.when(i < F.lit(boundary), F.floor(i / F.lit(q + 1)))
        .otherwise(F.lit(r) + F.floor((i - F.lit(boundary)) / F.lit(max(q, 1))))
        + 1
    ).cast("long")
    per_tile = (
        ranked.select(tile.alias("decile"), "__y", "__s")
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("__y").alias("n_pos"),
            F.sum("__s").alias("__sum_s"),
        )
    )
    return per_tile.select(
        "decile",
        "n_rows",
        "n_pos",
        F.expr("__sum_s div n_rows").alias("mean_score_milli"),
        F.expr("(1000 * n_pos) div n_rows").alias("pos_rate_milli"),
    )


def cohens_kappa(
    events: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
    positive_types: tuple[str, ...] = ("purchase", "signup"),
    value_threshold: float = 35.0,
) -> DataFrame:
    """Inter-rater agreement (Cohen's kappa) between two binary
    labelers over the same rows (round 6) — the label-QA primitive for
    training-data pipelines where a cheap heuristic and a second system
    (LLM judge, human sample) both tag the corpus and you need
    chance-corrected agreement, not raw accuracy. Rater A here is the
    type heuristic (high-intent event types), rater B the value rule
    (value ≥ threshold).

    One map-side-combined aggregate produces the exact 2×2 contingency
    counts; kappa = (p_o − p_e)/(1 − p_e) is scalar double math on
    those identical integers, rounded to 6 dp (NULL when p_e = 1, the
    degenerate all-one-cell case). Rows with NULL type/value are
    dropped (the ks_test convention).

    Returns one row: (n, n11, n10, n01, n00, kappa).
    """
    base = events.where(
        F.col(type_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(type_col).isin(*positive_types).cast("int").alias("a"),
        (F.col(value_col) >= F.lit(value_threshold)).cast("int").alias("b"),
    )
    cells = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("a") * F.col("b"))).cast("long").alias("n11"),
        F.sum((F.col("a") * (1 - F.col("b")))).cast("long").alias("n10"),
        F.sum(((1 - F.col("a")) * F.col("b"))).cast("long").alias("n01"),
        F.sum(((1 - F.col("a")) * (1 - F.col("b")))).cast("long").alias("n00"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / n
    pa = (F.col("n11") + F.col("n10")).cast("double") / n
    pb = (F.col("n11") + F.col("n01")).cast("double") / n
    pe = pa * pb + (1.0 - pa) * (1.0 - pb)
    kappa = F.when(pe < 1.0, F.round((po - pe) / (1.0 - pe), 6))
    return cells.select("n", "n11", "n10", "n01", "n00", kappa.alias("kappa"))


def mrr_recall_eval(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    rel_col_expr=None,
    id_col: str = "doc_id",
) -> DataFrame:
    """MRR + recall@k of the term-frequency ranking against an
    independent relevance signal (round 6) — the rank-position
    companions to `ndcg_at_k` (which only sees graded gain): MRR tells
    you where the FIRST relevant result lands, recall@k how much of
    the relevant set the cutoff keeps. Same engine-exact ranking keys
    as ndcg (tf desc, id asc — integers, identical in any engine), and
    the metrics themselves are exact integer milli: rr = 1000 div
    first_rel_pos, recall = (1000·hits_at_k) div n_rel. No float
    anywhere.

    Scale shape: one tokenize pass fanned over the literal term list,
    one rank window per term (parallel across terms, width = docs
    containing the term). Returns (term, first_rel_pos, rr_milli,
    hits_at_k, n_rel, recall_milli); terms with no relevant docs get
    NULL rr/recall.
    """
    if rel_col_expr is None:
        rel_col_expr = (F.col("lang") == "en").cast("int")
    lit_terms = F.array(*[F.lit(t) for t in terms])
    toks = docs.select(
        F.col(id_col).alias("__id"),
        rel_col_expr.alias("__rel"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
    ).filter(F.length(F.trim(F.col(text_col))) > 0)
    with_tf = (
        toks.select("__id", "__rel", "__toks", F.explode(lit_terms).alias("term"))
        .select(
            "term",
            "__id",
            "__rel",
            F.expr("size(filter(__toks, x -> x = term))").cast("long").alias("__tf"),
        )
        .filter(F.col("__tf") > 0)
    )
    w = Window.partitionBy("term").orderBy(F.desc("__tf"), F.asc("__id"))
    ranked = with_tf.withColumn("__pos", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("term")
        .agg(
            F.min(F.when(F.col("__rel") == 1, F.col("__pos"))).alias("first_rel_pos"),
            F.sum(
                F.when((F.col("__rel") == 1) & (F.col("__pos") <= k), 1).otherwise(0)
            )
            .cast("long")
            .alias("hits_at_k"),
            F.sum("__rel").cast("long").alias("n_rel"),
        )
        .select(
            "term",
            "first_rel_pos",
            F.expr("CASE WHEN first_rel_pos IS NOT NULL THEN 1000 div first_rel_pos END")
            .cast("long")
            .alias("rr_milli"),
            "hits_at_k",
            "n_rel",
            F.expr("CASE WHEN n_rel > 0 THEN (1000 * hits_at_k) div n_rel END")
            .cast("long")
            .alias("recall_milli"),
        )
    )


def rbo_rank_overlap(
    rank_a: DataFrame,
    rank_b: DataFrame,
    k: int = 10,
    p: float = 0.9,
    id_col: str = "doc_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Rank-biased overlap between two top-k rankings (round 8,
    Webber/Moffat/Zobel 2010): the top-weighted set-overlap measure
    retrieval teams use to answer "how much did the ranking actually
    CHANGE" when a scorer parameter moves — unlike Kendall/Spearman it
    handles non-conjoint lists (an id in one top-k but not the other),
    which is the normal case for top-k rankings.

    Truncated form: RBO@k = (1−p)·Σ_{d=1..k} p^(d−1)·|A_d ∩ B_d|/d.
    Overlap counts at every depth are EXACT integers (one inner join
    on id, k conditional sums); the depth weights are python-computed
    double literals shared verbatim with the oracle SQL, and the
    weighted reduction is a FIXED-ORDER k-term chain (the
    kruskal_wallis convention) — engine-identical to the last bit
    before the 6 dp round.

    Both inputs are top-k frames (≤k rows) — the join is trivially
    broadcast; nothing here touches corpus-sized data. Returns one row
    (k, overlap_at_k, rbo).
    """
    a = rank_a.select(F.col(id_col).alias("id"), F.col(rank_col).alias("ra"))
    b = rank_b.select(F.col(id_col).alias("id"), F.col(rank_col).alias("rb"))
    j = a.join(b, "id")
    agg = j.agg(
        *[
            F.sum(
                ((F.col("ra") <= d) & (F.col("rb") <= d)).cast("long")
            )
            .cast("long")
            .alias(f"__o{d}")
            for d in range(1, k + 1)
        ]
    )
    rbo = None
    for d in range(1, k + 1):
        w = (1 - p) * p ** (d - 1) / d
        term = F.coalesce(F.col(f"__o{d}"), F.lit(0)).cast("double") * F.lit(w)
        rbo = term if rbo is None else rbo + term
    return agg.select(
        F.lit(k).cast("long").alias("k"),
        F.coalesce(F.col(f"__o{k}"), F.lit(0)).cast("long").alias(
            "overlap_at_k"
        ),
        F.round(rbo, 6).alias("rbo"),
    )

"""Full-text retrieval over the corpus: BM25 scoring and TF-IDF.

A training-data pipeline needs keyword retrieval for targeted corpus
slicing ("pull every doc matching these terms, best first") and for
quality workflows (e.g. retrieve-then-inspect around a contamination
hit). This is the classic BM25 ranking function (Robertson/Spärck
Jones; the Lucene-style ``ln(1 + (N-df+0.5)/(df+0.5))`` non-negative
idf variant) expressed as a pure DataFrame plan.

Scale shape (the part that matters at 100 TB):

- The exploded token stream is filtered to the query's terms BEFORE
  anything shuffles — explode + filter are narrow, so the only
  per-token work is a scan; the ``groupBy(doc_id, term)`` tf shuffle
  carries *matching postings only* (|matches|, not |tokens|).
- Document length comes from the same scan (computed pre-explode and
  carried through the tf aggregation with ``first``), so no second
  scan and no doc-length join.
- df per term is a map-side-combined ``groupBy(term).count()`` on the
  aggregated postings, broadcast-joined back (≤ |query terms| rows).
  AQE's exchange reuse executes the postings shuffle once for both
  branches, so there is no second corpus scan AND no single-task
  count-over-window partition for a stop-word-adjacent hot term.
  N/avgdl are two broadcast scalars from one cheap stats aggregate.
- Top-k is ``orderBy(...).limit(k)`` → TakeOrderedAndProject:
  per-partition top-k, then a k-row merge on the driver — never a
  global sort.

Generalizes the reference's derive-key-then-match flow (main.py:15-18,
52-58) from exact identity to ranked relevance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from ..utils import parallelize_narrow


def term_postings(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, dl) for the query's terms only.

    dl (total tokens in the doc, matching or not) rides along from the
    pre-explode projection; the filter to ``query_terms`` happens on the
    narrow exploded stream so the tf shuffle is |matching postings|.
    """
    toks = parallelize_narrow(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text_col)).cast("long").alias("dl"),
        F.explode(tokens_col(text_col)).alias("tok"),
    )
    matches = toks.select(
        "doc_id", "dl", F.lower("tok").alias("term")
    ).filter(F.col("term").isin([t.lower() for t in query_terms]))
    return matches.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )


def _bm25_rank_topk(
    postings: DataFrame,
    df_per_term: DataFrame,
    stats: DataFrame,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """Score (doc_id, term, tf, dl) postings against (term, df) and a
    1-row (n_docs, avgdl) stats frame, and return the ranked top-k —
    the shape shared by the corpus-scan form (`bm25_topk`) and the
    materialized-index probe (text_index.bm25_search_indexed), so the
    two stay score-identical by construction."""
    scored = (
        postings.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("score"))
    )
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    # rank attachment over ≤k rows; non-foldable constant partition so
    # the single-partition window survives optimization without warnings
    w = Window.partitionBy(F.col("doc_id").isNotNull()).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return topk.withColumn("rnk", F.row_number().over(w))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for ``query_terms`` by BM25.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Returns (doc_id, score, rnk) with score rounded to 6 dp and a
    deterministic (score desc, doc_id asc) tie-break.
    """
    postings = term_postings(docs, query_terms, id_col, text_col)

    # corpus stats: one map-side-combined aggregate each, both tiny
    stats = docs.select(
        F.count("*").alias("n_docs"),
        F.avg(F.size(tokens_col(text_col)).cast("long")).alias("avgdl"),
    )
    # df per term: partial/final count on the aggregated postings,
    # broadcast back (≤ |query terms| rows). The earlier count-over-
    # window formulation funneled the hottest term's entire partition
    # through ONE task's sort; this shape map-side-combines. The
    # postings subtree appears in both branches, but AQE's exchange
    # reuse executes its shuffle once (verified in the final adaptive
    # plan: ReusedExchange), so there is no second corpus scan either.
    df_per_term = postings.groupBy("term").agg(F.count("*").alias("df"))

    return _bm25_rank_topk(postings, df_per_term, stats, k, k1, b)


def tfidf_topn(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-n feature terms by TF-IDF — the featurization
    counterpart of `bm25_topk` (search ranks docs for one query; this
    summarizes EVERY doc for downstream clustering / labeling / topic
    slicing).

    tfidf(t, d) = tf · (ln((1 + N)/(1 + df)) + 1)   (smoothed idf, so
    a term in every document still scores > 0 and the log never sees 0).

    Scale shape: tf is a map-side-combined ``groupBy(doc_id, term)``
    count; df is a partial/final count per term. Catalyst rewrites the
    df branch (which never reads the tf value) into a distinct-count
    with its own corpus scan — TWO scans total, the standard TF-IDF
    fit/transform shape: re-tokenizing beats materializing the
    |docs|×|terms| tf table, which is the thing that does NOT fit at
    corpus scale (callers with a cheap-to-cache corpus can persist
    upstream). The tf↔df join keys on ``term`` — the optimizer
    broadcasts the vocabulary when its stats say it fits and falls
    back to a shuffle join (AQE skew-splitting stop-word-heavy terms)
    when it doesn't. Top-n per doc is a window over ``doc_id`` —
    parallelism |docs|, no salt needed (planned as a partial+final
    WindowGroupLimit, so only ≤n rows per doc reach the window
    exchange). Everything is
    exact integer counts + one ln, so the oracle comparison carries no
    accumulation-order float drift.

    Returns (doc_id, term, tf, tfidf, rnk) with tfidf rounded to 6 dp
    and a deterministic (tfidf desc, term asc) tie-break.
    """
    toks = parallelize_narrow(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("tok"),
    ).select("doc_id", F.lower("tok").alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_per_term = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_per_term, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df")))
                    + 1.0
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= n
    )


def bm25_topk_many(
    docs: DataFrame,
    queries: dict[int, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k per query for a BATCH of keyword queries — the workload
    form of `bm25_topk` (a retrieval service scores many queries per
    corpus pass, not one).

    One postings pass covers the union of all query terms; the
    (query_id, term) table is a broadcast literal. Per-query top-k uses
    the salted two-phase rank (same shape as the grouped top-k in
    plans/queries.q_top_terms): phase 1 ranks within (query, salt)
    buckets — a query's true top-k must be in some bucket's top-k —
    phase 2 ranks the ≤ k·n_salt survivors per query, so parallelism is
    never bounded by the query count. Returns (query_id, doc_id, score,
    rnk) with the same idf/tf/length normalization as `bm25_topk`.
    """
    all_terms = sorted({t.lower() for ts in queries.values() for t in ts})
    postings = term_postings(docs, all_terms, id_col, text_col)
    # dedupe terms per query: bm25_topk counts a repeated query term
    # once (its isin filter dedupes), so the literal table must too or
    # the postings join would double that term's contribution
    qterms = docs.sparkSession.createDataFrame(
        sorted({(qid, t.lower()) for qid, ts in queries.items() for t in ts}),
        "query_id long, term string",
    )
    stats = docs.select(
        F.count("*").alias("n_docs"),
        F.avg(F.size(tokens_col(text_col)).cast("long")).alias("avgdl"),
    )
    # same hot-term-safe df shape as bm25_topk: map-side-combined count
    # + broadcast join back, postings shuffle shared via AQE reuse
    df_per_term = postings.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        postings.join(F.broadcast(df_per_term), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("part"), 6).alias("score"))
    )
    n_salt = 32
    salted = scored.withColumn("__salt", F.pmod(F.hash("doc_id"), F.lit(n_salt)))
    w_local = Window.partitionBy("query_id", "__salt").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    survivors = (
        salted.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__lr", "__salt")
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return survivors.withColumn("rnk", F.row_number().over(w_final)).filter(
        F.col("rnk") <= k
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    pool: int = 50,
    k_rrf: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009)
    of BM25 keyword ranking and exact cosine vector ranking —
    rrf(d) = Σ_systems 1/(k_rrf + rank_s(d)) over the systems that
    retrieved d in their top-``pool``.

    Rank fusion beats score fusion operationally because ranks need no
    cross-system score calibration, and it keeps the whole fusion
    exact: each branch is a top-``pool`` TakeOrderedAndProject, the
    join fuses two ≤pool-row frames (broadcast-sized regardless of
    corpus scale), and the RRF sum is two fixed-order double terms —
    deterministic and oracle-checkable.

    Returns (id, lex_rank, sem_rank, rrf_score, rnk); lex_rank /
    sem_rank are NULL when that system did not retrieve the document.
    """
    from .similarity import topk_cosine

    lex = bm25_topk(docs, query_terms, k=pool, id_col=id_col, text_col=text_col)
    sem = topk_cosine(emb, query_vec_id, k=pool, id_col=vec_id_col, vec_col=vec_col)
    l = lex.select(
        F.col(id_col).alias("id"), F.col("rnk").cast("long").alias("lex_rank")
    )
    s = sem.select(
        F.col(vec_id_col).alias("id"), F.col("rank").cast("long").alias("sem_rank")
    )
    fused = l.join(s, "id", "full_outer").select(
        "id",
        "lex_rank",
        "sem_rank",
        F.round(
            F.coalesce(1.0 / (F.lit(k_rrf) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k_rrf) + F.col("sem_rank")), F.lit(0.0)),
            9,
        ).alias("rrf_score"),
    )
    top = fused.orderBy(F.desc("rrf_score"), F.asc("id")).limit(k)
    w = Window.partitionBy(F.col("id") % 1).orderBy(
        F.desc("rrf_score"), F.asc("id")
    )
    return top.withColumn("rnk", F.row_number().over(w))


def rocchio_expand(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    top_terms: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rocchio pseudo-relevance-feedback query expansion (round 6):
    take the BM25 top-k as the assumed-relevant set R, score every
    non-query term by its aggregate relevance weight over R, and emit
    the strongest expansion candidates — the classic PRF step
    (Rocchio 1971; Robertson/Sparck-Jones term selection) a retrieval
    stack runs between first-pass ranking and re-query.

    Weight is tf·idf with the ODDS form of idf kept rational:
    weight_e6 = (1e6 · tf_R(t) · (2(N−df)+1)) div (2·df+1) — exactly
    the BM25 idf argument before the log, cross-multiplied into one
    integer div so term ranking is bit-identical in any engine (ln
    would put a libm ULP under a sort key). tf_R is the term's
    occurrence count inside R; df its corpus document frequency.

    Scale shape: R is ≤k ids (broadcast semi-join back to the corpus);
    candidate terms are bounded by R's token count, broadcast to
    filter the corpus-wide df scan; every aggregate map-side combines.
    The only corpus-sized work is the df pass — same bound as any
    postings build.

    Returns (term, tf_rel, df, weight_e6), top `top_terms` by
    (weight desc, term asc).
    """
    rel_ids = bm25_topk(
        docs, query_terms, k, id_col=id_col, text_col=text_col
    ).select(F.col("doc_id").alias(id_col))
    qset = [t.lower() for t in query_terms]
    rel_tf = (
        docs.join(F.broadcast(rel_ids), id_col, "left_semi")
        .select(F.explode(tokens_col(text_col)).alias("tok"))
        .select(F.lower("tok").alias("term"))
        .where(~F.col("term").isin(qset))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf_rel"))
    )
    cand = rel_tf.select("term")
    from ..utils import parallelize_narrow

    # candidate semi-join BEFORE the (doc, term) distinct (r9): the
    # distinct is the df pass's shuffle, and filtering the token stream
    # to R's candidate terms first shrinks it — same result (distinct
    # commutes with a filter on the key), strictly less shuffled;
    # spread the single-file explode while at it
    dfreq = (
        parallelize_narrow(docs)
        .select(
            F.col(id_col).alias("i"), F.explode(tokens_col(text_col)).alias("tok")
        )
        .select("i", F.lower("tok").alias("term"))
        .join(F.broadcast(cand), "term", "left_semi")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        rel_tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            "tf_rel",
            "df",
            F.expr(
                "(1000000 * tf_rel * (2 * (n_docs - df) + 1)) div (2 * df + 1)"
            )
            .cast("long")
            .alias("weight_e6"),
        )
    )
    return scored.orderBy(F.desc("weight_e6"), F.asc("term")).limit(top_terms)

"""Text-analysis operators over the `documents` table — extension X4.

Single-pass narrow projections + one aggregation; everything JVM-side
(see functions/text.py). At 100 TB these run as one scan each with
map-side partial aggregation — shuffle volume is |groups|, not |docs|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    content_hash_col,
    lang_id_col,
    normalize_text_col,
    quality_score_cols,
    repetition_cols,
    token_count_col,
    tokens_col,
)
from ..utils import parallelize_narrow


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-lang corpus stats: doc count, total tokens, avg chars/doc."""
    per_doc = docs.select(
        "lang",
        token_count_col("text").alias("n_tokens"),
        F.col("n_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 4).alias("avg_chars"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID per document."""
    return docs.select("doc_id", lang_id_col("text").alias("lang_pred"))


def quality_scores(docs: DataFrame) -> DataFrame:
    """Quality-signal table per document (ratios rounded for stability),
    including Gopher-style intra-doc repetition fractions.

    The repetition signals build per-row bigram arrays — compute-heavy
    enough that a single-file input partition serializes the whole scan
    onto one core, so spread narrow work first (no-op at real scale).
    """
    cols = quality_score_cols("text")
    rep = repetition_cols("text")
    return parallelize_narrow(docs).select(
        "doc_id",
        cols["n_chars"].alias("n_chars"),
        cols["n_tokens"].alias("n_tokens"),
        F.round(cols["punct_ratio"], 4).alias("punct_ratio"),
        F.round(cols["stopword_ratio"], 4).alias("stopword_ratio"),
        F.round(cols["alpha_ratio"], 4).alias("alpha_ratio"),
        F.round(cols["quality_score"], 4).alias("quality_score"),
        F.round(rep["dup_line_frac"], 4).alias("dup_line_frac"),
        F.round(rep["dup_bigram_frac"], 4).alias("dup_bigram_frac"),
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprint per document: 16-hex md5 of normalized text
    (cheap equality fingerprint) alongside the full sha256 content hash."""
    return docs.select(
        "doc_id",
        F.substring(F.md5(normalize_text_col("text")), 1, 16).alias("fingerprint"),
        content_hash_col("text").alias("content_hash"),
    )


def _bigram_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) for every adjacent lowercase token pair; empty for
    docs with < 2 tokens (guarded — Spark's sequence(1,0) descends)."""
    from ..functions.text import tokens_col

    toks = F.transform(tokens_col(text_col), lambda x: F.lower(x))
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return df.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, "p.w1", "p.w2"
    )


def lm_scores(
    docs: DataFrame,
    ref: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style LM quality proxy: mean Jelinek-Mercer-interpolated
    word-bigram log-probability of each document under a reference
    corpus model (default: the corpus itself). Fluent in-domain text
    scores high; gibberish and out-of-domain boilerplate score low —
    the standard model-based filter next to the rule-based
    quality_scores signals.

    p(w2|w1) = 0.9·c(w1,w2)/c(w1) + 0.1·(c(w2)+1)/(N+V)

    (bigram ML term 0 when w1 unseen; add-one unigram backoff with
    N = total tokens, V = |vocab| — pure add-one conditional smoothing
    under-penalizes unseen words when V is small, ranking gibberish
    above fluent text).

    Distributed shape: two count aggregations over the reference
    (map-side combined; shuffle is |vocab| + |bigram vocab|, never
    |tokens|), then the scoring pass joins each doc bigram against the
    count tables — equality joins Catalyst plans as broadcast or
    sort-merge by size — and one per-doc average. Returns
    (id_col, n_bigrams, lm_logprob). Docs with < 2 tokens get
    n_bigrams = 0 and NULL lm_logprob.
    """
    from ..functions.text import tokens_col

    ref = docs if ref is None else ref
    uni = (
        ref.select(
            F.explode(F.transform(tokens_col(text_col), lambda x: F.lower(x))).alias(
                "w1"
            )
        )
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    bi = (
        _bigram_pairs(ref, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    # vocab size as a broadcast scalar; built from a fresh unigram plan
    # (joining a frame with an aggregate of itself trips self-join
    # attribute ambiguity)
    vocab = (
        ref.select(
            F.explode(F.transform(tokens_col(text_col), lambda x: F.lower(x))).alias(
                "w"
            )
        )
        .agg(F.count_distinct("w").alias("V"), F.count("*").alias("N"))
    )
    uni2 = uni.select(F.col("w1").alias("w2"), F.col("c1").alias("c2"))
    doc_bi = _bigram_pairs(docs, id_col, text_col)
    ml = F.when(
        F.col("c1").isNotNull(),
        F.col("c12").cast("double") / F.col("c1").cast("double"),
    ).otherwise(F.lit(0.0))
    backoff = (F.coalesce("c2", F.lit(0)) + 1).cast("double") / (
        F.col("N") + F.col("V")
    ).cast("double")
    scored = (
        doc_bi.join(bi, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .join(uni2, "w2", "left")
        .join(F.broadcast(vocab))
        .select(
            id_col,
            F.log(F.lit(0.9) * F.coalesce(ml, F.lit(0.0)) + F.lit(0.1) * backoff).alias(
                "lp"
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_bigrams"),
        F.avg("lp").alias("lm_logprob"),
    )
    ids = docs.select(id_col)
    return (
        ids.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "lm_logprob",
        )
    )


def term_cooccurrence(
    docs: DataFrame,
    vocab_size: int = 100,
    top_pairs: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top co-occurring term pairs with PMI — the collocation signal a
    corpus pipeline uses to surface boilerplate phrases, template
    artifacts, and topic structure.

    pmi(a, b) = ln(n_ab · N / (df_a · df_b)) over document-level
    co-occurrence (n_ab = docs containing both, df = docs containing
    the term, N = corpus size).

    Scale shape: the naive pair space is |vocab|² — unbounded on a web
    corpus — so co-occurrence is restricted to the top-`vocab_size`
    terms by document frequency (the standard collocation practice,
    and the cap that bounds everything downstream). The vocab is a
    ≤`vocab_size`-row TakeOrderedAndProject over the df aggregate,
    COLLECTED once to the driver (bounded state, like k-means
    centroids) and re-planned as a literal — referencing the vocab
    subtree three times (membership filter, df_a, df_b) would
    otherwise re-scan and re-tokenize the corpus per reference.
    Pairs are generated NARROWLY:
    per-doc vocab terms are collected into a sorted set (≤`vocab_size`
    entries by construction) and expanded to ordered pairs with an
    array comprehension — no self-join, so the only shuffles are the
    distinct, the per-doc collect, and the final (a, b) count, each
    map-side combinable. Counts are exact integers, so the PMI oracle
    comparison carries no accumulation-order drift.

    Returns (term_a, term_b, n_ab, pmi) — top `top_pairs` by
    (n_ab desc, term_a asc, term_b asc), pmi rounded to 6 dp.
    """
    from ..functions.text import tokens_col

    raw = parallelize_narrow(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("tok"),
    ).select("doc_id", F.lower("tok").alias("term"))
    # the deduped (doc, term) relation is what BOTH passes consume —
    # the vocab collect below is a separate action, so without a
    # checkpoint the pair pass re-tokenized the full corpus a second
    # time (r10): the lazy checkpoint is materialized by the vocab
    # action (which had to compute the distinct anyway) and the pair
    # pass reads the stored |distinct(doc,term)| narrow rows instead —
    # trading a second full tokenize+explode+distinct for bounded
    # (type-level, not token-level) executor storage
    dt = raw.distinct().localCheckpoint(eager=False)
    # df pass: the one place the full-vocabulary distinct is needed
    df_per_term = dt.groupBy("term").agg(F.count("*").alias("df"))
    vocab_rows = (
        df_per_term.orderBy(F.desc("df"), F.asc("term"))
        .limit(vocab_size)
        .collect()
    )
    vocab = docs.sparkSession.createDataFrame(
        [(r["term"], r["df"]) for r in vocab_rows], "term string, df long"
    )
    n_docs = docs.select(F.count("*").alias("n_docs"))

    # pair pass: the checkpointed relation filtered to the broadcast
    # vocab — the shuffle carries only deduped vocab-term rows
    per_doc = (
        dt.join(F.broadcast(vocab.select("term")), "term")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("term")).alias("terms"))
    )
    pairs = per_doc.select(
        F.explode(
            F.expr(
                "flatten(transform(terms, (x, i) -> "
                "transform(slice(terms, i + 2, size(terms)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b"))
    n_ab = pairs.groupBy("term_a", "term_b").agg(F.count("*").alias("n_ab"))

    dfa = vocab.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    dfb = vocab.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    return (
        n_ab.join(F.broadcast(dfa), "term_a")
        .join(F.broadcast(dfb), "term_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab") * F.col("n_docs")
                    / (F.col("df_a") * F.col("df_b"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("n_ab"), F.asc("term_a"), F.asc("term_b"))
        .limit(top_pairs)
    )


def term_divergence(
    docs: DataFrame,
    slice_col: str,
    slice_a: str,
    slice_b: str,
    top_k: int = 25,
    text_col: str = "text",
) -> DataFrame:
    """Top terms driving the Jensen-Shannon divergence between two
    corpus slices — the distribution-drift diagnostic run between
    crawl snapshots, sources, or time windows before a new slice is
    admitted into a training mix.

    Per term: p = freq in slice a, q = freq in slice b, m = (p+q)/2,
    js_term = (p·ln(p/m) + q·ln(q/m)) / 2 with 0·ln(0) = 0; the total
    JS divergence is the sum over terms (each row carries its share).

    Scale shape: ONE scan — the slice filter pushes into it, the
    (term, slice) count is map-side combinable, and the two slices
    pivot into (c_a, c_b) columns via conditional aggregation (no
    self-join). Totals are a broadcast 1-row aggregate over the same
    counts; top-k is TakeOrderedAndProject. All inputs to the math are
    exact integer counts, so the oracle comparison carries no
    accumulation drift.

    Returns (term, c_a, c_b, js_term) — top_k by (js_term desc, term
    asc), js_term rounded to 9 dp (contributions are small; 6 dp would
    flatten the ordering).
    """
    from ..functions.text import tokens_col

    toks = (
        parallelize_narrow(docs)
        .filter(F.col(slice_col).isin([slice_a, slice_b]))
        .select(
            F.col(slice_col).alias("__slice"),
            F.explode(tokens_col(text_col)).alias("tok"),
        )
        .select("__slice", F.lower("tok").alias("term"))
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("__slice") == slice_a, 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("__slice") == slice_b, 1).otherwise(0)).alias("c_b"),
    )
    totals = counts.select(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    )
    p = F.col("c_a") / F.col("n_a")
    q = F.col("c_b") / F.col("n_b")
    m = (p + q) / 2
    term0 = lambda x: F.when(x > 0, x * F.log(x / m)).otherwise(F.lit(0.0))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "term",
            "c_a",
            "c_b",
            F.round((term0(p) + term0(q)) / 2, 9).alias("js_term"),
        )
        .orderBy(F.desc("js_term"), F.asc("term"))
        .limit(top_k)
    )


def dup_passages(
    docs: DataFrame,
    n: int = 5,
    k: int = 20,
    min_docs: int = 2,
    text_col: str = "text",
    two_phase: bool | None = None,
    candidate_slack: int = 50,
    two_phase_min_bytes: int = 1 << 30,
) -> DataFrame:
    """Top-k most duplicated word n-gram passages corpus-wide — the
    passage-level dedup signal (cf. Lee et al., "Deduplicating
    Training Data Makes Language Models Better").

    two_phase=True is the 100 TB form: shingle strings never shuffle.
    Phase 1 counts xxhash64(passage) — the shuffle carries only longs —
    and collects the top k*candidate_slack duplicate hashes (bounded
    driver state, like k-means centroids). Phase 2 rescans, keeps only
    shingles whose hash is a candidate (an isin literal filter pushed
    into the narrow pass), and exact-counts the surviving strings.
    The candidate set keeps every hash tied-or-above the k-th count,
    and when a count-tie plateau overflows the k*candidate_slack cap
    the operator falls back to the direct form — so the two forms are
    exactly equal unless a 64-bit hash collision lands inside the
    top-k count range (vanishingly unlikely); parity is test-pinned.

    two_phase=False is the direct form: one scan, but the shuffle
    carries distinct (partition, passage-string) pairs.

    two_phase=None picks by the optimizer's input-size estimate, like
    a broadcast threshold: below `two_phase_min_bytes` the corpus is
    scan-bound and the direct form's single pass wins; above it the
    string shuffle dominates and hashing pays for the second scan.
    """
    from ..functions.text import tokens_col
    from .dedup import word_shingles_col

    if two_phase is None:
        est = int(docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        two_phase = est >= two_phase_min_bytes

    base = (
        parallelize_narrow(docs)
        .filter(F.size(tokens_col(text_col)) >= n)
        .select(F.explode(word_shingles_col(F.col(text_col), n)).alias("passage"))
    )
    counted = lambda df: (
        df.groupBy("passage")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), F.asc("passage"))
        .limit(k)
    )
    if not two_phase:
        return counted(base)

    cap = k * candidate_slack
    rows = (
        base.select(F.xxhash64("passage").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_docs)
        .orderBy(F.desc("c"), F.asc("h"))
        .limit(cap + 1)
        .collect()
    )
    if not rows:
        return counted(base).limit(0)
    # Tie-plateau guard: candidate hashes are ordered by (count, hash)
    # but the final top-k is ordered by (count, passage) — if the cap
    # cuts INSIDE the k-th count's tie region, the hash-ordered subset
    # could exclude a lexicographically-winning passage. Detect it (the
    # first excluded hash still ties the k-th count) and fall back to
    # the direct form; otherwise keep exactly the hashes tied-or-above
    # the k-th count, which provably contains the true top-k.
    kth = rows[min(k, len(rows)) - 1]["c"]
    if len(rows) > cap and rows[cap]["c"] >= kth:
        return counted(base)
    cand = [r["h"] for r in rows[:cap] if r["c"] >= kth]
    return counted(base.filter(F.xxhash64("passage").isin(cand)))


def remove_boilerplate(
    docs: DataFrame,
    min_df_frac: float = 0.5,
    unit_delim: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4/CCNet-style boilerplate removal: delete every text unit that
    appears in at least ``min_df_frac`` of all documents (nav bars,
    cookie banners, license footers — the cross-document repeated
    lines that poison LM training data).

    ``unit_delim`` picks the granularity: '\\n' (the production
    line-level form) or ' ' (corpus-frequency stopword pruning — same
    plumbing, useful for index building). Empty units are never
    counted as boilerplate (blank lines are structure, not content)
    and survive removal, so spacing round-trips.

    Scale shape: unit document-frequency is a two-level distinct
    ((doc, unit) dedup → map-side-combined count); the frequent-unit
    set joins back by equality — left to AQE, which broadcasts it when
    it is small (it usually is: units shared by half the corpus are
    few) and shuffle-joins otherwise; the rebuild is ONE groupBy(doc)
    with position-sorted reassembly (collect_list skips the removed
    units' NULLs, array_sort orders by the unique position, so the
    result is deterministic under any shuffle order).

    Returns (id_col, clean_text, n_removed).
    """
    units = parallelize_narrow(docs).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), unit_delim)).alias(
            "pos", "unit"
        ),
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    df_per_unit = (
        units.filter(F.col("unit") != "")
        .select(id_col, "unit")
        .distinct()
        .groupBy("unit")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    frequent = (
        df_per_unit.crossJoin(F.broadcast(n_docs))
        .filter(F.col("__df") >= F.lit(min_df_frac) * F.col("__n_docs"))
        .select("unit", F.lit(True).alias("__rm"))
    )
    flagged = units.join(frequent, "unit", "left")
    rebuilt = flagged.groupBy(id_col).agg(
        F.concat_ws(
            unit_delim,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__rm").isNull(),
                            F.struct(F.col("pos"), F.col("unit")),
                        )
                    )
                ),
                lambda x: x["unit"],
            ),
        ).alias("clean_text"),
        F.sum(F.coalesce(F.col("__rm").cast("long"), F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
    )
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_removed", F.lit(0)).cast("bigint").alias("n_removed"),
        )
    )


def bigram_lm_topk(docs: DataFrame, top_n: int = 50, text_col: str = "text") -> DataFrame:
    """Bigram language model with add-1 smoothing — the count-based LM
    primitive (n-gram corpus statistics for contamination screens,
    fertility checks, classic perplexity baselines). Returns the
    ``top_n`` bigrams by count with their smoothed conditional
    probability P(w2|w1) = (c₁₂+1)/(c₁+V) in exact milli-units.

    Everything derives from ONE bigram-count aggregate: the history
    count c₁ is Σ_w2 c₁₂ (window over w1 — thousands of keys, well
    partitioned), V is the distinct-successor count (1-row aggregate
    cross-joined back), and the probability is integer division —
    bit-identical in any engine. Top-n runs through
    TakeOrderedAndProject on the total (count desc, w1, w2) order.

    Scale: bigram generation is a per-row array transform (no
    self-join); the single shuffle is the map-side-combined
    (w1, w2) count.
    """
    toks = docs.select(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("t")
    ).filter((F.length(F.trim(F.col(text_col))) > 0) & (F.expr("size(t)") >= 2))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) as w1, element_at(t, i + 1) as w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    counts = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    w_hist = Window.partitionBy("w1")
    with_hist = counts.withColumn("c1", F.sum("c12").over(w_hist).cast("long"))
    v = counts.agg(F.countDistinct("w2").cast("long").alias("v"))
    return (
        with_hist.crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c_bigram"),
            "c1",
            F.expr("(1000 * (c12 + 1)) div (c1 + v)").alias("condprob_milli"),
        )
        .orderBy(F.col("c_bigram").desc(), "w1", "w2")
        .limit(top_n)
    )


def doc_lm_familiarity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document familiarity under the corpus's own add-1-smoothed
    bigram LM — the count-based stand-in for LM perplexity filtering
    (CCNet-style: documents whose n-grams the corpus LM finds
    surprising are outliers/noise; unusually familiar ones are
    boilerplate). Returns (doc_id, n_bigrams, familiarity_milli) for
    every doc with ≥2 tokens, where familiarity_milli is the mean
    smoothed conditional probability P(w2|w1) in exact milli-units —
    all integer arithmetic (div), bit-identical in any engine, no
    float logs to drift.

    Scale: bigram counts are ONE map-side-combined aggregate over a
    per-row array transform (no self-join); doc bigrams join the count
    table on (w1, w2) — a keyed shuffle that never moves documents,
    only (doc_id, w1, w2) triples.
    """
    toks = docs.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("t"),
    ).filter((F.length(F.trim(F.col(text_col))) > 0) & (F.expr("size(t)") >= 2))
    doc_bigrams = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) as w1, element_at(t, i + 1) as w2))"
            )
        ).alias("b"),
    ).select(id_col, "b.w1", "b.w2")
    counts = doc_bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    w_hist = Window.partitionBy("w1")
    with_hist = counts.withColumn("c1", F.sum("c12").over(w_hist).cast("long"))
    v = counts.agg(F.countDistinct("w2").cast("long").alias("v"))
    probs = with_hist.crossJoin(F.broadcast(v)).select(
        "w1",
        "w2",
        F.expr("(1000 * (c12 + 1)) div (c1 + v)").alias("p_milli"),
    )
    return (
        doc_bigrams.join(probs, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.expr("sum(p_milli) div count(*)").alias("familiarity_milli"),
        )
    )


def zipf_fit(
    docs: DataFrame,
    slice_col: str = "lang",
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Zipf-law fit per corpus slice: OLS slope of ln(freq) on
    ln(rank) over the slice's ``top_k`` terms. Natural text sits near
    slope −1; a slice that strays far (template spam ≈ flat, boiler-
    plate ≈ cliff) is the kind of distribution anomaly a corpus audit
    wants surfaced per source/language before training.

    Scale shape: ONE scan — (slice, term) counts map-side combine,
    per-slice ranks run in a window partitioned by the slice key
    (parallel across slices), and the regression sums aggregate the
    ≤top_k surviving rows per slice. Counts and ranks are exact
    integers; ln() of those integers is deterministic per engine
    operand, the ≤top_k-term float sums drift below 1e-12, and the
    output rounds to 6 dp.

    Returns (slice, n_terms, slope, r2).
    """
    from ..functions.text import tokens_col

    toks = parallelize_narrow(docs).select(
        F.col(slice_col).alias("s"),
        F.explode(tokens_col(text_col)).alias("tok"),
    )
    counts = toks.groupBy("s", F.lower("tok").alias("term")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("s").orderBy(F.col("c").desc(), F.col("term"))
    ranked = counts.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= top_k
    )
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("c").cast("double"))
    sums = ranked.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n_terms").cast("double")
    cov = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return sums.filter(F.col("n_terms") >= 3).select(
        F.col("s").alias(slice_col),
        "n_terms",
        F.round(cov / varx, 6).alias("slope"),
        F.round(
            F.when(vary > 0, (cov * cov) / (varx * vary)).otherwise(
                F.lit(None).cast("double")
            ),
            6,
        ).alias("r2"),
    )


def dup_rate_by_source(
    docs: DataFrame, slice_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Within-slice exact-duplicate rate — the corpus-QA rollup that
    answers "which feed is re-sending content" before dedup even runs:
    per slice, total docs vs distinct normalized content hashes.

    Catalyst plans count(distinct) as a two-level aggregate ((slice,
    hash) pre-aggregate, then the count), so the shuffle carries
    distinct pairs, not raw text. All outputs are integer (milli rate
    via `div`). Uses the same SHA-256-over-normalized-text key as the
    X1 exact-dedup operator, so the rate here predicts exactly what
    exact_dedup would drop.
    Output: (slice, n_docs, n_unique, n_dups, dup_rate_milli).
    """
    from ..functions.text import content_hash_col

    agg = parallelize_narrow(docs).groupBy(
        F.col(slice_col).alias("s")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct(content_hash_col(text_col)).cast("long").alias(
            "n_unique"
        ),
    )
    return agg.select(
        F.col("s").alias(slice_col),
        "n_docs",
        "n_unique",
        (F.col("n_docs") - F.col("n_unique")).alias("n_dups"),
        F.expr("(1000 * (n_docs - n_unique)) div n_docs").alias(
            "dup_rate_milli"
        ),
    )


def doc_char_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document character-level Shannon entropy — the
    compression-proxy quality signal that catches what token ratios
    miss: base64/hex blobs and key-mash spam score HIGH (near-uniform
    bytes), template/repeated-char junk scores LOW; natural prose sits
    in a stable mid band per language. Complements quality_scores'
    Gopher-style repetition fractions (those see repeated LINES and
    BIGRAMS, this sees the raw symbol distribution).

    Exact counts: one explode to (doc, char) rows, one map-side-
    combined groupBy for counts, then the count-side identity
    H = ln(n) − (Σ c·ln c)/n per document (same algebra as
    column_entropy) — ln() on exact integers, rounded to 6 dp at the
    boundary. Work is linear in corpus bytes, the same bound as any
    tokenization pass; the per-doc rollup shuffles (doc, char, count)
    triples, never text.

    Returns (doc_id, n_chars_counted, char_entropy) for non-empty
    docs.
    """
    chars = docs.where(F.length(text_col) > 0).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "")).alias("ch"),
    )
    counts = chars.groupBy(id_col, "ch").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_doc = counts.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_chars_counted"),
        F.sum(
            F.col("c").cast("double") * F.log(F.col("c").cast("double"))
        ).alias("__clnc"),
    )
    n = F.col("n_chars_counted").cast("double")
    return per_doc.select(
        id_col,
        "n_chars_counted",
        F.round(F.log(n) - F.col("__clnc") / n, 6).alias("char_entropy"),
    )


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _col_sum(cols: list) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher-style rule-based document filter (round 6): the seven
    classic pass/fail gates (Rae et al. 2021 Table A1, reused by
    MassiveText/Dolma/RefinedWeb) as per-document integer flags plus
    the conjunctive keep decision — the standard first quality screen
    before any learned classifier touches the corpus.

    Every rule is an exact integer comparison (cross-multiplied, no
    float ratio ever materializes), so the decision replays
    bit-identically in any engine:

      r_word_count    min_words <= n_words <= max_words
      r_mean_word_len 3 <= (word chars / words) <= 10
                      i.e. 3*n_words <= n_wordchars <= 10*n_words
      r_symbol_ratio  (# + ellipsis) / words <= 0.1
      r_bullet_lines  lines starting with a bullet < 0.9 of lines
      r_ellipsis_lines lines ending with an ellipsis < 0.3 of lines
      r_alpha_words   words containing a letter >= 0.8 of words
      r_stopwords     >= 2 distinct hits from the 8-word Gopher list

    Scale shape: a single narrow projection pass — per-row array ops
    only, no shuffle, no Python; at 100 TB this pipelines with the
    scan exactly like quality_scores (X4).

    Returns (doc_id, n_words, n_lines, 7 int flags, gopher_keep).
    """
    from ..functions.text import tokens_col

    t = F.col(text_col)
    toks = tokens_col(t)
    toks_l = F.transform(toks, lambda x: F.lower(x))
    n_words = F.size(toks).cast("long")
    n_wordchars = F.length(F.regexp_replace(t, r"\s", "")).cast("long")
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    ).cast("long")
    n_symbols = F.size(
        F.regexp_extract_all(t, F.lit(r"#|\.\.\.|…"), F.lit(0))
    ).cast("long")
    n_alpha_words = F.size(
        F.filter(toks, lambda x: x.rlike(r"[A-Za-z]"))
    ).cast("long")
    n_stop = _col_sum(
        [
            F.array_contains(toks_l, w).cast("long")
            for w in _GOPHER_STOPWORDS
        ]
    )
    base = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_wordchars.alias("__wc"),
        n_lines.alias("n_lines"),
        n_bullet.alias("__nb"),
        n_ellipsis.alias("__ne"),
        n_symbols.alias("__ns"),
        n_alpha_words.alias("__na"),
        n_stop.alias("__nstop"),
    )
    nw = F.col("n_words")
    flags = {
        "r_word_count": (nw >= min_words) & (nw <= max_words),
        "r_mean_word_len": (nw > 0)
        & (3 * nw <= F.col("__wc"))
        & (F.col("__wc") <= 10 * nw),
        "r_symbol_ratio": 10 * F.col("__ns") <= nw,
        "r_bullet_lines": 10 * F.col("__nb") < 9 * F.col("n_lines"),
        "r_ellipsis_lines": 10 * F.col("__ne") < 3 * F.col("n_lines"),
        "r_alpha_words": (nw > 0) & (5 * F.col("__na") >= 4 * nw),
        "r_stopwords": F.col("__nstop") >= 2,
    }
    out = base.select(
        id_col,
        "n_words",
        "n_lines",
        *[c.cast("int").alias(n) for n, c in flags.items()],
    )
    keep = _col_sum([F.col(n) for n in flags])
    return out.withColumn(
        "gopher_keep", (keep == len(flags)).cast("int")
    )


def quality_quantile_normalize(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source quantile normalization of a document quality signal
    (round 6): raw scores from different sources live on different
    scales (a crawl dump's alpha density is not a forum's), so a single
    global threshold keeps whole sources or drops them wholesale —
    the standard fix before a cross-corpus quality floor is to replace
    each score by its WITHIN-SOURCE quantile.

    Integer-exact end to end: the raw signal is alpha density in milli
    ((1000·n_alpha) div n_chars — the exact-integer slice of the X4
    quality blend), the quantile is ((rank−1)·1000) div (n−1) with
    RANK() so ties share a value — both deterministic in any engine.

    Scale shape (round-9 rewrite, the trimmed_mean tie-group rule):
    `source` is LOW-cardinality, so a rank window partitioned by it
    over the full doc frame would serialize every source's population
    through one task. But q_milli is bounded to 0..1000 by
    construction, so RANK() lives on TIE GROUPS exactly: a map-side
    combinable groupBy(source, q_milli) count, a cumsum over the
    ≤1001-row-per-source value frame (rank of a tie group = 1 +
    count of strictly smaller values), and a broadcast join of the
    tiny (source, q_milli → q_norm) lookup back onto the docs. No
    data-scale window anywhere; identical output.

    The projected (id, source, q) frame feeds BOTH the tie aggregate
    and the final join through one explicit repartition — AQE's
    exchange reuse then computes the regexp q signal ONCE (measured
    at the 100× rung: two independent scans 13.3 s, reused exchange
    6.2 s). The shuffle ships ~20-byte rows; re-reading and
    re-regexping the corpus would cost ~50× that I/O at 100 TB.

    Returns (doc_id, source, q_milli, q_norm_milli).
    """
    q = F.expr(
        f"(1000 * length(regexp_replace({text_col}, '[^A-Za-z]', '')))"
        f" div greatest(length({text_col}), 1)"
    ).cast("long")
    # explicit NULL drop (the textstats convention): a NULL source or
    # NULL text (→ NULL q_milli) would silently vanish in the
    # equi-join below while the rank-window oracle kept it
    base = (
        docs.where(
            F.col(source_col).isNotNull() & F.col(text_col).isNotNull()
        )
        .select(
            F.col(id_col), F.col(source_col).alias("source"), q.alias("q_milli")
        )
        .repartition(F.col("source"), F.col("q_milli"))
    )
    tie = base.groupBy("source", "q_milli").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    wv = Window.partitionBy("source").orderBy("q_milli")
    wall = Window.partitionBy("source")
    lut = (
        tie.withColumn(
            "__rk", (F.sum("__cnt").over(wv) - F.col("__cnt") + 1).cast("long")
        )
        .withColumn("__n", F.sum("__cnt").over(wall).cast("long"))
        .select(
            "source",
            "q_milli",
            F.expr("((__rk - 1) * 1000) div greatest(__n - 1, 1)")
            .cast("long")
            .alias("q_norm_milli"),
        )
    )
    return base.join(F.broadcast(lut), ["source", "q_milli"]).select(
        id_col, "source", "q_milli", "q_norm_milli"
    )


def vocab_growth(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_checkpoints: int = 10,
) -> DataFrame:
    """Vocabulary-growth (Heaps-law) curve over corpus prefixes
    (round 6): cumulative distinct vocabulary and token volume at
    ``n_checkpoints`` equal-document prefixes of the corpus in doc-id
    order — the curve whose V ≈ k·Nᵝ shape tells a corpus builder
    whether more data still buys new vocabulary (β well above 0 ⇒
    keep crawling; flat ⇒ the source is exhausted). `new_vocab` per
    checkpoint is the marginal version of the same signal.

    Exact and scalable: the doc's checkpoint bucket comes from
    X10's assign_global_ids (range-partition + partition-offset rank —
    NO global-sort window), so bucket = (rank·k) div N is one integer
    expression; cumulative distinct vocabulary uses the first-seen
    rewrite (X60's trick): each term's MIN bucket, counted per bucket,
    prefix-summed over the k-row frame — never a distinct per prefix.

    Returns (checkpoint, n_docs_cum, n_tokens_cum, n_vocab_cum,
    new_vocab), checkpoint 1..n_checkpoints.
    """
    from ..functions.text import tokens_col
    from ..operators.packing import assign_global_ids

    ids = assign_global_ids(docs.select(id_col), id_col)
    n = ids.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    decs = ids.crossJoin(F.broadcast(n)).select(
        id_col,
        (
            F.expr(f"(row_id * {n_checkpoints}) div __n").cast("long") + 1
        ).alias("ck"),
    )
    per_doc = docs.select(
        F.col(id_col), token_count_col(text_col).alias("__nt")
    )
    from ..utils import parallelize_narrow

    tok = parallelize_narrow(docs).select(
        F.col(id_col),
        F.explode(
            F.transform(tokens_col(text_col), lambda x: F.lower(x))
        ).alias("term"),
    )
    d_docs = decs.groupBy("ck").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    d_tok = (
        per_doc.join(decs, id_col)
        .groupBy("ck")
        .agg(F.sum("__nt").cast("long").alias("n_tokens"))
    )
    # ck is monotone non-decreasing in doc id (it is a floor of the
    # doc-id rank), so each term's first-seen bucket is the bucket of
    # its MINIMUM doc id — reduce the token stream to |vocab| rows with
    # one map-side-combined groupBy BEFORE any join (r9: the earlier
    # tok ⋈ decs joined the full exploded token stream against a
    # |docs|-sized map, a real shuffle of |tokens| rows at scale)
    first_doc = tok.groupBy("term").agg(F.min(id_col).alias(id_col))
    newv = (
        first_doc.join(decs, id_col)
        .groupBy("ck")
        .agg(F.count(F.lit(1)).cast("long").alias("new_vocab"))
    )
    per_ck = (
        d_docs.join(d_tok, "ck", "left")
        .join(newv, "ck", "left")
        .select(
            "ck",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("new_vocab", F.lit(0)).cast("long").alias("new_vocab"),
        )
    )
    w = (
        Window.partitionBy(F.col("ck") % 1)
        .orderBy("ck")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_ck.select(
        F.col("ck").alias("checkpoint"),
        F.sum("n_docs").over(w).cast("long").alias("n_docs_cum"),
        F.sum("n_tokens").over(w).cast("long").alias("n_tokens_cum"),
        F.sum("new_vocab").over(w).cast("long").alias("n_vocab_cum"),
        "new_vocab",
    )


def zipf_slope(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Zipf rank–frequency fit per source (round 7): OLS slope of
    ln(freq) on ln(rank) over the top-``top_n`` terms — the companion
    diagnostic to X101's Heaps curve (vocab GROWTH there, vocabulary
    CONCENTRATION here). A natural corpus sits near slope −1; a
    slope far shallower flags templated/boilerplate-heavy text, far
    steeper flags tiny-vocabulary spam — both route straight into the
    X4 quality gates.

    Determinism: term counts are exact integers; rank is a total order
    (freq desc, term asc); the regression runs on exactly top_n
    (rank, ln f) points with ln/Σ/÷ in doubles rounded to 6 dp — the
    X13/X48 ln-rounding convention.

    Scale shape: one token-count aggregate (map-side combined), one
    per-group top-N rank window (single shuffle on the group key),
    then a |groups|-row regression aggregate. The top-N bound keeps
    the fit stage constant-size however large the vocabulary grows.

    Returns (source, n_terms_used, slope, intercept).
    """
    from ..functions.text import tokens_col

    counts = (
        docs.where(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.explode(F.transform(tokens_col(text_col), lambda x: F.lower(x))).alias(
                "term"
            ),
        )
        .groupBy("g", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    w = Window.partitionBy("g").orderBy(F.col("f").desc(), F.col("term").asc())
    ranked = counts.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= top_n
    )
    x = F.log(F.col("rk").cast("double"))
    y = F.log(F.col("f").cast("double"))
    m = ranked.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_used"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    n_d = F.col("n_terms_used").cast("double")
    denom = n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (n_d * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    intercept = (F.col("sy") - slope * F.col("sx")) / n_d
    return m.where(F.col("n_terms_used") >= 2).select(
        F.col("g").alias(group_col),
        "n_terms_used",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


def cross_source_overlap(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise vocabulary overlap between sources (round 7):
    |V_a ∩ V_b| and integer-milli Jaccard for every source pair — the
    corpus-mixing readout ("which feeds are lexically redundant?")
    that sits between per-source profiling (X11) and cross-corpus
    containment (X64): buy a new source only if its vocabulary is not
    already covered.

    Exact set algebra on distinct (source, lowercased token); the pair
    fan-out joins on the TOKEN, so a token in k sources contributes
    C(k,2) rows — bounded by the SOURCE count (k ≤ |sources|, a
    report-sized constant), never by document count: the classic
    df²-explosion of document-pair joins (blocking_eval's truth side)
    structurally cannot happen at the source grain.

    Returns (source_a, source_b, n_a, n_b, n_inter, jaccard_milli).
    """
    from ..functions.text import tokens_col

    vocab = (
        docs.where(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.explode(F.transform(tokens_col(text_col), lambda x: F.lower(x))).alias(
                "term"
            ),
        )
        .distinct()
    )
    sizes = vocab.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("nv"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(b, [F.col("a.term") == F.col("b.term"), F.col("a.g") < F.col("b.g")])
        .groupBy(F.col("a.g").alias("ga"), F.col("b.g").alias("gb"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    # complete pair matrix: disjoint sources matter too ("this feed is
    # genuinely new vocabulary") — build all ga<gb pairs from the tiny
    # sizes frame and left-join the intersections
    allpairs = (
        sizes.select(F.col("g").alias("ga"), F.col("nv").alias("n_a"))
        .crossJoin(
            F.broadcast(sizes.select(F.col("g").alias("gb"), F.col("nv").alias("n_b")))
        )
        .where(F.col("ga") < F.col("gb"))
    )
    return (
        allpairs.join(inter, ["ga", "gb"], "left")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0).cast("long")))
        .select(
            F.col("ga").alias("source_a"),
            F.col("gb").alias("source_b"),
            "n_a",
            "n_b",
            "n_inter",
            F.expr("(1000 * n_inter) div (n_a + n_b - n_inter)").alias(
                "jaccard_milli"
            ),
        )
    )


def source_length_info_gain(
    docs: DataFrame,
    group_col: str = "source",
    len_col: str = "n_chars",
    thresholds: tuple[int, ...] = (200, 400, 800),
) -> DataFrame:
    """Information gain of `source` about the document-length bucket
    (round 7): IG = H(bucket) − H(bucket | source) in milli-nats —
    "how much does knowing the feed tell you about the length
    profile?", the mutual-information companion to X40 (feature MI)
    at the corpus-governance grain. IG ≈ 0 ⇒ sources share one length
    profile and per-source length gates are redundant; large IG ⇒
    per-source thresholds genuinely differ.

    Buckets are FIXED integer thresholds (deterministic, no learned
    quantiles: the gate thresholds a pipeline would actually deploy);
    entropies are plain-count ratios with ln in doubles, rounded to
    6 dp at the milli-nat scale (the X48 divergence convention).

    One (source, bucket) count aggregate — cells bounded by
    |sources|×(len(thresholds)+1). Returns one row
    (n_docs, n_sources, n_buckets, h_bucket_milli, h_cond_milli,
    info_gain_milli).
    """
    bucket = F.lit(len(thresholds)).cast("long")
    for i, t in sorted(enumerate(thresholds), reverse=True):
        bucket = F.when(F.col(len_col) < t, F.lit(i).cast("long")).otherwise(bucket)
    cells = (
        docs.where(F.col(group_col).isNotNull() & F.col(len_col).isNotNull())
        .select(F.col(group_col).alias("g"), bucket.alias("bk"))
        .groupBy("g", "bk")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    gt = cells.groupBy("g").agg(F.sum("c").cast("long").alias("gc"))
    bt = cells.groupBy("bk").agg(F.sum("c").cast("long").alias("bc"))
    n = cells.agg(F.sum("c").cast("long").alias("n"))
    h_b = (
        bt.crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                -(F.col("bc").cast("double") / F.col("n").cast("double"))
                * F.log(F.col("bc").cast("double") / F.col("n").cast("double"))
            ).alias("h")
        )
        .select(F.col("h").alias("h_bucket"))
    )
    # H(B|G) = Σ_g (n_g/N) Σ_b −(c/n_g)·ln(c/n_g)
    h_cond = (
        cells.join(F.broadcast(gt), "g")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                -(F.col("c").cast("double") / F.col("n").cast("double"))
                * F.log(F.col("c").cast("double") / F.col("gc").cast("double"))
            ).alias("h_cond")
        )
    )
    counts = cells.agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.countDistinct("g").cast("long").alias("n_sources"),
        F.countDistinct("bk").cast("long").alias("n_buckets"),
    )
    return (
        counts.crossJoin(F.broadcast(h_b))
        .crossJoin(F.broadcast(h_cond))
        .select(
            "n_docs",
            "n_sources",
            "n_buckets",
            F.round(F.col("h_bucket") * 1000.0, 6).alias("h_bucket_milli"),
            F.round(F.col("h_cond") * 1000.0, 6).alias("h_cond_milli"),
            F.round((F.col("h_bucket") - F.col("h_cond")) * 1000.0, 6).alias(
                "info_gain_milli"
            ),
        )
    )


def dup_ngram_ratio(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """WITHIN-document repeated n-gram fraction (round 8): what share
    of a document's word n-gram OCCURRENCES belong to an n-gram that
    appears 2+ times in that same document — the Gopher repetition
    screen (Rae et al. 2021 Table A1's "duplicate n-grams" family)
    that `gopher_rules` deliberately leaves out: cross-document dedup
    (X1/X2) never sees a looping generator or a boilerplate-stuffed
    page that repeats ITSELF, and those poison an LM corpus just as
    hard as exact duplicates.

    Exact integers: occurrences are non-distinct (repetition counting
    needs every occurrence — the shingle helpers dedup, so the n-gram
    build here keeps multiplicity), dup share is a 1000-scaled
    floor-div. Texts with fewer than n words have one degenerate
    shingle (the whole text) and ratio 0 unless that shingle repeats
    — count conventions identical in both engines.

    Scale shape: explode → two map-side-combinable aggregates keyed
    by (doc, gram) then doc — partial aggregation collapses repeats
    before the shuffle, so the wire carries distinct grams, not
    occurrences. No window, no join.

    Returns (doc_id, n_grams, dup_grams, dup_ratio_milli).
    """
    from ..functions.text import tokens_col

    def _grams(t):
        n_sh = F.greatest(F.size(t) - (n - 1), F.lit(1))
        starts = F.sequence(F.lit(1), n_sh)
        return F.transform(
            starts, lambda i: F.concat_ws(" ", F.slice(t, i, n))
        )

    grams = F.element_at(
        F.transform(F.array(tokens_col(text_col)), _grams), 1
    )
    occ = (
        parallelize_narrow(docs)
        .select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        occ.groupBy("id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0)))
            .cast("long")
            .alias("dup_grams"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            "dup_grams",
            F.expr("(1000 * dup_grams) div n_grams").cast("long").alias(
                "dup_ratio_milli"
            ),
        )
    )


def vocab_coverage_estimate(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Chao1 vocabulary-richness + Good–Turing missing-mass estimate
    per language (round 8) — the "how much corpus is still out there"
    pair every data-acquisition plan wants next to X101's Heaps curve:
    Chao1 (Chao 1984) lower-bounds the TRUE vocabulary size from the
    singleton/doubleton counts (V + F1²/(2·F2)); Good–Turing's P₀ =
    F1/N says what probability mass the next crawl batch will consist
    of unseen words — together they answer "is this language's corpus
    saturated or barely scratched".

    Exact integers: V, F1, F2, N are exact counts; chao1_est is ONE
    float expression on them (F2=0 falls back to the bias-corrected
    F1·(F1−1)/2 form, Chao's own convention), missing_mass_milli is
    an integer floor-div. Scale shape: two map-side-combinable
    aggregates — (lang, token) counts collapse before the shuffle,
    then one rollup per lang. No window, no join.

    Returns (lang, n_tokens, vocab, f1_singletons, f2_doubletons,
    chao1_est, missing_mass_milli).
    """
    toks = parallelize_narrow(docs).where(
        F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"), F.explode(tokens_col(text_col)).alias("w")
    )
    counts = toks.groupBy("g", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    agg = counts.groupBy("g").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    chao1 = F.when(
        F.col("f2") > 0, F.col("vocab").cast("double") + f1 * f1 / (2.0 * f2)
    ).otherwise(
        F.col("vocab").cast("double") + f1 * (f1 - 1.0) / 2.0
    )
    return agg.where(F.col("n_tokens") > 0).select(
        F.col("g").alias(group_col),
        "n_tokens",
        "vocab",
        F.col("f1").alias("f1_singletons"),
        F.col("f2").alias("f2_doubletons"),
        F.round(chao1, 6).alias("chao1_est"),
        F.expr("(1000 * f1) div n_tokens").cast("long").alias(
            "missing_mass_milli"
        ),
    )


def top_terms_drift(
    docs: DataFrame,
    k: int = 20,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Temporal vocabulary drift per source (round 8): Jaccard overlap
    of the top-k term sets between the corpus's FIRST and SECOND half
    (by doc_id — the fixture's arrival order) — the cheap "did this
    source change what it talks about" gate that catches a feed
    silently switching domain/language mid-crawl, which every
    downstream mixing weight (X8b/X69) silently inherits.

    Deterministic: halves split at the per-source MEDIAN doc_id rank
    (first ⌈n/2⌉ docs vs the rest), top-k by (count desc, term) total
    order — identical set selection in any engine; Jaccard on exact
    set sizes as a 1000-scaled floor-div.

    Scale shape: the median-rid half boundary comes from a two-level
    rid-bucket decomposition of a NARROW (source, rid) frame (the
    embedding_distance_profile sample precedent — round-9 sweep fix:
    the r8 form ran a row_number window partitioned by the
    low-cardinality source over the full token-array-carrying frame).
    rid is unique, so a ``rid div 4096`` bucket holds ≤4096 rows; the
    per-(source, bucket) count cumsum finds the bucket containing
    rank ⌈n/2⌉, the exact threshold rid is ranked inside that ONE
    ≤4096-row bucket, and the per-source (threshold, n) broadcasts
    back onto the docs. (source, half, term) counts then map-side
    combine; the final per-source overlap is a k-row self-join on
    tiny frames. Returns
    (source, n_docs, top_k_first, top_k_second, n_common,
    jaccard_milli).
    """
    bucket_w = 4096
    narrow = (
        parallelize_narrow(docs)
        .where(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.col(id_col).cast("long").alias("rid"),
        )
    )
    bkts = narrow.groupBy(
        "g", F.floor(F.col("rid") / bucket_w).cast("long").alias("bkt")
    ).agg(F.count(F.lit(1)).cast("long").alias("__c"))
    wb = Window.partitionBy("g").orderBy("bkt")
    cumb = (
        bkts.withColumn("cum", F.sum("__c").over(wb))
        .withColumn("n", F.sum("__c").over(Window.partitionBy("g")))
        .withColumn("__tgt", F.expr("cast(ceil(n / 2.0) as bigint)"))
    )
    boundary = cumb.where(
        (F.col("cum") >= F.col("__tgt"))
        & (F.col("cum") - F.col("__c") < F.col("__tgt"))
    ).select(
        "g", "bkt", (F.col("cum") - F.col("__c")).alias("__prev"),
        "n", "__tgt",
    )
    wn2 = Window.partitionBy("g").orderBy("rid")
    thr = (
        narrow.withColumn(
            "bkt", F.floor(F.col("rid") / bucket_w).cast("long")
        )
        .join(F.broadcast(boundary), ["g", "bkt"])
        .withColumn("rk", F.row_number().over(wn2))
        .where(F.col("__prev") + F.col("rk") == F.col("__tgt"))
        .select("g", F.col("rid").alias("__thr"), "n")
    )
    # the tokenizer expression is INLINED into the explode: exploding
    # a NAMED array projection lets InferFiltersFromGenerate derive
    # `size(__t) > 0` and push the whole regexp-split expression into
    # the pre-shuffle Filter, re-running it ~4x per row on the 1-task
    # scan stage (measured 10x at the 100x docs rung — the generate
    # cousin of the r8 HOF-projection-filter lesson; the r8 window
    # was accidentally a barrier against it)
    halves = (
        parallelize_narrow(docs)
        .where(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.col(id_col).cast("long").alias("rid"),
            F.col(text_col).alias("__txt"),
        )
        .join(F.broadcast(thr), "g")
        .select(
            "g",
            "n",
            F.when(F.col("rid") <= F.col("__thr"), 1)
            .otherwise(2)
            .alias("half"),
            F.explode(tokens_col("__txt")).alias("w"),
        )
    )
    # SINGLE-PASS overlap (round-9): the r8 form derived `top` once
    # and consumed it THREE times (a-side, b-side, sizes) — Spark
    # re-executes the doc-scale tokenize upstream per consumer, so the
    # self-join tripled the whole pipeline. Pivot the two halves into
    # one (g, w, c1, c2) frame instead: both top-k ranks ride the SAME
    # aggregate and the intersection is a boolean AND per term — one
    # upstream execution, zero self-joins. Rank equivalence: all
    # c1>0 rows sort before every c1=0 row under (c1 desc, w), so the
    # per-half ranks match the old per-(g, half) window exactly; the
    # c>0 guard drops the absent-in-this-half rows the old frame never
    # contained. The rank window input is the per-source VOCAB
    # aggregate (narrow rows), not the doc frame.
    counts = halves.groupBy("g", "w").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("half") == 2, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
        F.max("n").cast("long").alias("n_docs"),
    )
    w1 = Window.partitionBy("g").orderBy(F.col("c1").desc(), F.col("w"))
    w2 = Window.partitionBy("g").orderBy(F.col("c2").desc(), F.col("w"))
    flagged = (
        counts.withColumn("rk1", F.row_number().over(w1))
        .withColumn("rk2", F.row_number().over(w2))
        .select(
            "g",
            "n_docs",
            ((F.col("rk1") <= k) & (F.col("c1") > 0)).alias("in1"),
            ((F.col("rk2") <= k) & (F.col("c2") > 0)).alias("in2"),
        )
        .where(F.col("in1") | F.col("in2"))
    )
    return (
        flagged.groupBy("g")
        .agg(
            F.max("n_docs").cast("long").alias("n_docs"),
            F.sum(F.col("in1").cast("long")).cast("long").alias("ka"),
            F.sum(F.col("in2").cast("long")).cast("long").alias("kb"),
            F.sum((F.col("in1") & F.col("in2")).cast("long"))
            .cast("long")
            .alias("n_common"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_docs",
            F.col("ka").alias("top_k_first"),
            F.col("kb").alias("top_k_second"),
            F.col("n_common"),
            F.expr("(1000 * n_common) div (ka + kb - n_common)")
            .cast("long")
            .alias("jaccard_milli"),
        )
    )


def lang_label_audit(
    docs: DataFrame,
    group_col: str = "source",
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Label-vs-heuristic language agreement per source (round 8): run
    the X4 `lang_id_col` heuristic over every document and score it
    against the corpus's own lang LABELS, per source — the label-QA
    audit that finds the mislabeled subcorpus (a feed whose 'en' label
    is wrong poisons every per-language mixing weight and tokenizer
    budget downstream; disagreement CONCENTRATED in one source is the
    actionable signature, global accuracy alone hides it).

    Exact integers: agreement counts and 1000-scaled floor-div
    accuracy; the heuristic is the same deterministic expression the
    `lang_id` query ships. One combined aggregate per (source, label,
    predicted) then a per-source rollup — no window, no join.

    Returns (source, n_docs, n_agree, accuracy_milli,
    top_confusion, top_confusion_n) where top_confusion is the most
    frequent disagreeing label->predicted pair ('label->pred',
    ties to the lexically first pair).
    """
    from ..functions.text import lang_id_col

    base = (
        parallelize_narrow(docs)
        .where(F.col(group_col).isNotNull() & F.col(label_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.col(label_col).alias("lb"),
            lang_id_col(text_col).alias("pred"),
        )
    )
    cells = base.groupBy("g", "lb", "pred").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # the top confusion is picked deterministically via a window with
    # a (count desc, label, pred) total order — max_by over struct keys
    # is engine-fiddly and has no tie contract
    wrong = cells.where(F.col("lb") != F.col("pred"))
    w = Window.partitionBy("g").orderBy(
        F.col("c").desc(), F.col("lb"), F.col("pred")
    )
    top = (
        wrong.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "g",
            F.concat(F.col("lb"), F.lit("->"), F.col("pred")).alias(
                "top_confusion"
            ),
            F.col("c").alias("top_confusion_n"),
        )
    )
    sums = cells.groupBy("g").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("lb") == F.col("pred"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    return (
        sums.join(top, "g", "left")
        .select(
            F.col("g").alias(group_col),
            "n_docs",
            "n_agree",
            F.expr("(1000 * n_agree) div n_docs").cast("long").alias(
                "accuracy_milli"
            ),
            F.coalesce(F.col("top_confusion"), F.lit("none")).alias(
                "top_confusion"
            ),
            F.coalesce(F.col("top_confusion_n"), F.lit(0))
            .cast("long")
            .alias("top_confusion_n"),
        )
    )

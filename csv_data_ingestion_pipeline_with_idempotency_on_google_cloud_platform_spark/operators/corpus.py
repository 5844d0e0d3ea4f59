"""Composite corpus-preparation pipeline — the end-to-end LLM
training-data flow this engine exists for, composed from the individual
operators:

    raw documents → quarantine (handled at source) → exact dedup →
    near-dup candidate removal (MinHash-LSH) → quality filter →
    language tag → per-stage retention report

Everything stays declarative: one logical plan per output, no driver
loops, nothing persisted (the LSH self-join recomputes its codegen'd
signature fold — see dedup.minhash_lsh_candidates for why that beats
caching). Dropping the higher id of each confident pair guarantees the
minimum id of every chained cluster survives (it is never any pair's
id_b) but can over-retain middle nodes of a chain whose linking edge
LSH did not emit (pairs (1,3),(2,3) keep both 1 and 2);
near_dup_clusters is the explicit connected-components form when
exactly-one-survivor-per-cluster semantics are required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import lang_id_col, quality_score_cols
from ..utils import parallelize_narrow
from . import dedup


def prepare_corpus(
    docs: DataFrame,
    min_quality: float = 0.3,
    min_tokens: int = 3,
    near_dup_jaccard: float = 0.8,
    with_report: bool = True,
    eval_set: DataFrame | None = None,
    decontam_ngram: int = 5,
    classifier_weights: DataFrame | None = None,
    classifier_prior: DataFrame | None = None,
    min_score_milli: int = 0,
) -> tuple[DataFrame, DataFrame | None]:
    """Returns (clean_docs, report).

    clean_docs: (doc_id, text, lang_pred) surviving exact dedup,
    near-dup removal (higher id of each candidate pair dropped), token
    floor, quality floor, and — when the optional model/benchmark
    inputs are supplied — benchmark decontamination (`eval_set`:
    drop any doc sharing a word `decontam_ngram`-gram with it, the
    cross_set_ngram_overlap broadcast shape) and a trained-classifier
    score floor (`classifier_weights`/`classifier_prior` from
    operators/classify; docs scoring < `min_score_milli` drop).
    report: one row per pipeline stage with rows_in/rows_out, or None
    with ``with_report=False``.

    The report rides `observe()` metrics attached at every stage
    boundary, so ONE action (a count of the final stage) collects every
    stage's retention in a single pipeline execution — no per-stage
    prefix re-runs. The returned `clean` frame stays lazy; a caller
    action executes the pipeline once more, so audit mode costs two
    executions total. At 100 TB the pipeline runs with
    ``with_report=False`` and stage outputs written to storage between
    stages; retention counts then come from the writes' own metrics,
    costing nothing extra.
    """
    from pyspark.sql import Observation

    observations: list[tuple[str, Observation]] = []

    def _observe(df: DataFrame, name: str) -> DataFrame:
        # a stage boundary is consumed by BOTH the next main-path join
        # and its side computation (pair gen / drop list); Spark reports
        # the CollectMetrics node once per query, so the count stays
        # exact (verified: 100-row stage consumed twice observes 100)
        if not with_report:
            return df
        ob = Observation(name)
        observations.append((name, ob))
        return df.observe(ob, F.count(F.lit(1)).alias("n"))

    # Resolve the near-dup hot-bucket cap BEFORE attaching any
    # observation: choose_bucket_cap's sample detector runs eager
    # actions, and an Observation locks to the FIRST action that runs
    # through its node — a detector pass would freeze the stage counts
    # at sampled values. Resolved on the unobserved frame, the observed
    # pipeline below stays fully lazy until the one counting action.
    if with_report:
        plain_kept = docs.join(
            F.broadcast(dedup.exact_dedup(docs).select("doc_id")),
            "doc_id",
            "semi",
        )
        resolved_cap = dedup.choose_bucket_cap(plain_kept)
    else:
        resolved_cap = "auto"

    docs = _observe(docs, "input")

    # 1. exact dedup — keep min-id doc per content hash
    kept_ids = dedup.exact_dedup(docs).select("doc_id")
    exact_kept = _observe(
        docs.join(F.broadcast(kept_ids), "doc_id", "semi"), "exact_dedup"
    )

    # 2. near-dup removal — drop the higher id of each confident pair
    pairs = dedup.minhash_lsh_candidates(
        exact_kept,
        min_est_jaccard=near_dup_jaccard,
        max_bucket_size=resolved_cap,
    )
    drop_ids = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    near_kept = _observe(
        exact_kept.join(F.broadcast(drop_ids), "doc_id", "left_anti"),
        "near_dedup",
    )

    # 3. quality + token floor, language tag — the signals are computed
    # INLINE on the survivor stream (r10): the earlier
    # near_kept ⋈ quality_scores(near_kept) self-join evaluated the
    # survivor subtree twice and paid a doc_id shuffle of both sides
    # just to reattach columns derived from the same rows (doc_id is
    # unique, so join ≡ filter). Same rounded signals, same rows.
    qc = quality_score_cols("text")
    clean = (
        parallelize_narrow(near_kept)
        .filter(
            (F.round(qc["quality_score"], 4) >= min_quality)
            & (qc["n_tokens"] >= min_tokens)
        )
        .select("doc_id", "text", lang_id_col("text").alias("lang_pred"))
    )
    clean = _observe(clean, "quality_filter")

    # 4. optional benchmark decontamination (eval side broadcasts;
    #    the corpus side never shuffles — dedup.cross_set_ngram_overlap)
    if eval_set is not None:
        hits = dedup.cross_set_ngram_overlap(
            clean, eval_set, n=decontam_ngram
        ).select(F.col("train_id").alias("doc_id")).distinct()
        clean = _observe(
            clean.join(F.broadcast(hits), "doc_id", "left_anti"),
            "decontamination",
        )

    # 5. optional trained-classifier score floor (weights table is
    #    ≤ vocab_size rows → broadcast; one doc-keyed shuffle)
    if classifier_weights is not None:
        from .classify import score_documents

        keep = (
            score_documents(
                clean.withColumn("__lbl", F.lit(None).cast("string")),
                classifier_weights,
                classifier_prior,
                label_col="__lbl",
            )
            .filter(F.col("score_milli") >= min_score_milli)
            .select("doc_id")
        )
        clean = _observe(
            clean.join(keep, "doc_id", "semi"), "classifier_filter"
        )

    if not with_report:
        return clean, None
    # ONE action fires every observation along the plan
    clean.count()
    counts = {name: int(ob.get["n"]) for name, ob in observations}
    stages = []
    prev = counts["input"]
    for name, _ob in observations:
        stages.append((name, prev if name != "input" else counts["input"], counts[name]))
        prev = counts[name]
    report = docs.sparkSession.createDataFrame(
        stages, "stage string, rows_in long, rows_out long"
    )
    return clean, report


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions by content hash:
    (id, status) with status in {added, removed, changed, unchanged}.

    The change-detection primitive of incremental pipelines: only
    'added'/'changed' docs need re-tokenizing, re-embedding, re-dedup
    probing downstream. One full-outer equi-join on the id — a single
    key shuffle; hashes are computed in the narrow scan on each side,
    so text never crosses the wire.
    """
    from ..functions.text import content_hash_col

    # presence is tracked with explicit markers, NOT hash nullity — a
    # doc with NULL text hashes to NULL and would otherwise masquerade
    # as absent; the hash comparison is null-safe for the same reason
    o = old.select(
        F.col(id_col),
        content_hash_col(text_col).alias("__ho"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col),
        content_hash_col(text_col).alias("__hn"),
        F.lit(True).alias("__in_new"),
    )
    return (
        o.join(n, id_col, "full_outer")
        .select(
            id_col,
            F.when(F.col("__in_old").isNull(), F.lit("added"))
            .when(F.col("__in_new").isNull(), F.lit("removed"))
            .when(~F.col("__ho").eqNullSafe(F.col("__hn")), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


def preference_pairs(
    scored: DataFrame,
    group_cols: list[str] | None = None,
    score_col: str = "quality_score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Build (chosen, rejected) preference pairs per group — the
    DPO/RLHF-style pair construction applied to corpus curation: in
    every (source, lang) bucket the best-scoring document is `chosen`,
    the worst is `rejected`, and the integer margin is the training
    weight. Groups need ≥2 documents and a non-degenerate pair.

    Determinism: scores are 4-dp-rounded floats upstream, so
    round(score·10⁴) is an EXACT integer key both engines agree on;
    ordering ties break to the lower id for chosen / higher id for
    rejected, so a group of identical scores still yields a stable,
    non-degenerate pair. One map-side-combined groupBy carrying two
    max(struct) partials — no window, no second shuffle.
    """
    if group_cols is None:
        group_cols = ["source", "lang"]
    si = F.round(F.col(score_col) * 10000).cast("long")
    keyed = scored.select(
        *group_cols,
        F.col(id_col).alias("__id"),
        si.alias("__si"),
    )
    agg = keyed.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        # chosen: max score, tie -> LOWER id (negate id inside max)
        F.max(F.struct(F.col("__si").alias("s"), (-F.col("__id")).alias("ni"))).alias(
            "__c"
        ),
        # rejected: min score, tie -> HIGHER id
        F.min(F.struct(F.col("__si").alias("s"), (-F.col("__id")).alias("ni"))).alias(
            "__r"
        ),
    )
    return (
        agg.filter(F.col("n_docs") >= 2)
        .select(
            *group_cols,
            "n_docs",
            (-F.col("__c.ni")).cast("long").alias("chosen_id"),
            (-F.col("__r.ni")).cast("long").alias("rejected_id"),
            F.col("__c.s").alias("chosen_score_dm"),
            F.col("__r.s").alias("rejected_score_dm"),
            (F.col("__c.s") - F.col("__r.s")).cast("long").alias("margin_dm"),
        )
        .filter(F.col("chosen_id") != F.col("rejected_id"))
    )


def range_checksums(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    bucket: int = 100,
) -> DataFrame:
    """Per-range integrity summary: bucket rows by `id div bucket` and
    reduce each range to (row count, XOR of a 60-bit row hash). XOR is
    order-free and overflow-free, so the checksum is exact whatever the
    partitioning; the count catches what XOR alone cannot (a row
    duplicated an even number of times cancels out of the XOR).
    One map-side-combined groupBy (<= |ids|/bucket rows ever shuffle).
    """
    from .sketches import _hash60

    # ':' marks the id/payload boundary — without it (id=1, payload='2A')
    # and (id=12, payload='A') hash identically (id is numeric, so ':'
    # cannot appear inside it). NULL payloads get a sentinel distinct
    # from '' (concat_ws would otherwise silently skip the NULL).
    row_h = _hash60(
        F.concat_ws(
            ":",
            F.col(id_col).cast("string"),
            F.coalesce(F.col(payload_col), F.lit("<null>")),
        )
    )
    return (
        df.where(F.col(id_col).isNotNull())
        .select(
            F.expr(f"{id_col} div {bucket}").cast("long").alias("rng"),
            row_h.alias("h"),
        )
        .groupBy("rng")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("bit_xor(h)").cast("long").alias("cs"),
        )
    )


def range_checksum_diff(
    v1: DataFrame,
    v2: DataFrame,
    id_col: str,
    payload_col: str,
    bucket: int = 100,
) -> DataFrame:
    """Which id-ranges differ between two table versions - WITHOUT a
    row-level join. The anti-entropy / replica-sync primitive: each
    side reduces to |ids|/bucket (range, count, xor-checksum) rows; the
    full-outer join compares summaries, and only ranges flagged
    `same = false` ever need corpus_diff's row-level treatment. At
    100 TB that is the difference between shuffling two tables and
    shuffling two manifests a million times smaller.

    Returns (rng, n_1, n_2, same) - checksums stay internal, counts
    are reported (they double as the size-drift readout).
    """
    a = range_checksums(v1, id_col, payload_col, bucket).select(
        "rng", F.col("n").alias("n_1"), F.col("cs").alias("cs_1")
    )
    b = range_checksums(v2, id_col, payload_col, bucket).select(
        "rng", F.col("n").alias("n_2"), F.col("cs").alias("cs_2")
    )
    j = a.join(b, "rng", "full_outer")
    return j.select(
        "rng",
        F.coalesce("n_1", F.lit(0).cast("long")).alias("n_1"),
        F.coalesce("n_2", F.lit(0).cast("long")).alias("n_2"),
        (
            F.coalesce("n_1", F.lit(0)).eqNullSafe(F.coalesce("n_2", F.lit(0)))
            & F.coalesce("cs_1", F.lit(0)).eqNullSafe(
                F.coalesce("cs_2", F.lit(0))
            )
        ).alias("same"),
    )


def token_yield_report(
    docs: DataFrame,
    quality_floor_milli: int = 400,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source token accounting through the cleaning pipeline
    (round 6): how many training tokens each source contributes RAW,
    after exact dedup (min-id survivor per normalized content hash),
    and after an alpha-density quality floor on the survivors — the
    report a corpus owner reads before committing a mixture, because
    "source X is 30% of raw tokens" routinely becomes "8% after
    cleaning" and the mixture weights must follow.

    Exact integers end to end: whitespace token counts, the X1 content
    hash for survivorship, the X79 integer alpha-density signal for
    the floor; yields are milli ratios via `div`. One narrow
    projection, one dedup groupBy (map-side combined on the content
    hash), one per-source rollup.

    Returns (source, docs_raw, tokens_raw, tokens_after_dedup,
    tokens_after_quality, dedup_yield_milli, final_yield_milli).
    """
    from ..functions.text import content_hash_col, token_count_col

    base = docs.select(
        F.col(id_col).alias("__id"),
        F.col(source_col).alias("source"),
        content_hash_col(text_col).alias("__h"),
        token_count_col(text_col).alias("__tok"),
        F.expr(
            f"(1000 * length(regexp_replace({text_col}, '[^A-Za-z]', '')))"
            f" div greatest(length({text_col}), 1)"
        )
        .cast("long")
        .alias("__q"),
    )
    # renamed join keys: keep derives from base, so unaliased column
    # objects would be ambiguous self-join references
    keep = (
        base.groupBy("__h")
        .agg(F.min("__id").alias("__keep_id"))
        .select(F.col("__h").alias("__kh"), "__keep_id")
    )
    tagged = base.join(
        keep,
        (F.col("__h") == F.col("__kh")) & (F.col("__id") == F.col("__keep_id")),
        "left_semi",
    )
    survivors = tagged.select(
        "source",
        "__tok",
        F.when(F.col("__q") >= quality_floor_milli, F.col("__tok"))
        .otherwise(F.lit(0))
        .alias("__tok_q"),
    )
    raw = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs_raw"),
        F.sum("__tok").cast("long").alias("tokens_raw"),
    )
    kept = survivors.groupBy("source").agg(
        F.sum("__tok").cast("long").alias("tokens_after_dedup"),
        F.sum("__tok_q").cast("long").alias("tokens_after_quality"),
    )
    return (
        raw.join(kept, "source", "left")
        .select(
            "source",
            "docs_raw",
            "tokens_raw",
            F.coalesce("tokens_after_dedup", F.lit(0)).alias("tokens_after_dedup"),
            F.coalesce("tokens_after_quality", F.lit(0)).alias("tokens_after_quality"),
            F.expr(
                "CASE WHEN tokens_raw > 0 THEN (1000 * coalesce(tokens_after_dedup, 0)) div tokens_raw END"
            )
            .cast("long")
            .alias("dedup_yield_milli"),
            F.expr(
                "CASE WHEN tokens_raw > 0 THEN (1000 * coalesce(tokens_after_quality, 0)) div tokens_raw END"
            )
            .cast("long")
            .alias("final_yield_milli"),
        )
    )

"""Data-selection operators: scoring raw documents against a target
distribution so a 100 TB crawl can be *resampled* toward the data you
actually want more of, instead of hard-filtered.

`dsir_weights` follows the hashed n-gram importance-resampling recipe
of DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", arXiv:2302.03169): fit two bag-of-hashed-
bigram unigram models — one on a small in-domain target slice, one on
the raw pool — and weight every raw document by its log likelihood
ratio. Documents whose hashed-feature profile looks like the target
float up; resampling by those weights approximates sampling from the
target distribution. The reference pipeline
(csv-processor-function/main.py) has no analogue — this is part of
the training-data extension surface (SURVEY.md §2b).

Determinism contract: feature counts are exact integers from one
map-side-combined aggregate; each bucket's log ratio is ln() of a
double composed from those exact integers (identical operands ⇒
identical IEEE result in any engine), rounded to integer milli-nats
*per bucket* BEFORE the per-document sum — so every cross-row sum is
integer arithmetic and the result is bit-stable under any partition
order (same trick as textstats.doc_lm_familiarity).

Scale shape (one pass over text, two small shuffles):
* doc → hashed-bigram rows is a pure projection + explode (no join);
* bucket stats are ONE groupBy over ``n_buckets`` keys (map-side
  combine collapses each partition to ≤n_buckets rows) with the
  target/raw totals re-aggregated from the same partials;
* the ≤n_buckets weight table broadcast-joins back onto the
  doc-bigram rows — the corpus itself never reshuffles for stats;
* the final per-doc sum groups on doc_id (the only data-sized
  shuffle, and it moves (doc_id, bucket) pairs, never text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dsir_weights(
    docs: DataFrame,
    target_filter: str = "lang = 'en'",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-document DSIR importance weight in integer milli-nats.

    ``target_filter`` is a SQL predicate naming the in-domain slice
    (default: English docs); the raw pool is the whole frame. Buckets
    are the low ``n_buckets`` residue of the md5-prefix u32 of each
    word bigram, so assignment is engine-agnostic. Add-1 smoothing on
    both models keeps every bucket finite.

    Returns (doc_id, n_feats, dsir_milli) for docs with ≥2 tokens:
    dsir_milli = Σ_b round(1000 · ln(p_target(b)/p_raw(b))); positive
    ⇒ looks like the target, negative ⇒ looks like the background.
    """
    toks = docs.select(
        F.col(id_col),
        F.expr(target_filter).cast("int").alias("is_t"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("t"),
    ).filter(
        (F.length(F.trim(F.col(text_col))) > 0) & (F.expr("size(t)") >= 2)
    )
    feats = toks.select(
        id_col,
        "is_t",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("bg"),
    ).select(
        id_col,
        "is_t",
        (
            F.conv(F.substring(F.md5(F.col("bg")), 1, 8), 16, 10).cast("long")
            % n_buckets
        ).alias("bucket"),
    )
    # two consumers (bucket stats, the per-doc weight join) re-execute
    # the explode+md5 pipeline without a shared boundary; one explicit
    # bucket-key exchange lets the groupBy reuse it directly and the
    # join read it as a ReusedExchange — the hash pipeline runs once,
    # and a single-file scan's 1-2 partitions spread as a side effect
    # (r9)
    feats = feats.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "bucket"
    )
    bucket_stats = feats.groupBy("bucket").agg(
        F.sum("is_t").cast("long").alias("c_t"),
        F.count(F.lit(1)).cast("long").alias("c_r"),
    )
    totals = bucket_stats.agg(
        F.sum("c_t").cast("long").alias("tot_t"),
        F.sum("c_r").cast("long").alias("tot_r"),
    )
    b = float(n_buckets)
    ratio = (
        (F.col("c_t").cast("double") + 1.0)
        * (F.col("tot_r").cast("double") + b)
    ) / (
        (F.col("c_r").cast("double") + 1.0)
        * (F.col("tot_t").cast("double") + b)
    )
    weights = bucket_stats.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(F.log(ratio) * 1000.0).cast("long").alias("w_milli"),
    )
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("w_milli").cast("long").alias("dsir_milli"),
        )
    )

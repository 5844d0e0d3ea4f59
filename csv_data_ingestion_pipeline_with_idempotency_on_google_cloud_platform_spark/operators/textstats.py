"""Text-analysis operators over the `documents` table — extension X4.

Single-pass narrow projections + one aggregation; everything JVM-side
(see functions/text.py). At 100 TB these run as one scan each with
map-side partial aggregation — shuffle volume is |groups|, not |docs|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    content_hash_col,
    lang_id_col,
    normalize_text_col,
    quality_score_cols,
    repetition_cols,
    token_count_col,
)


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
    including Gopher-style intra-doc repetition fractions."""
    cols = quality_score_cols("text")
    rep = repetition_cols("text")
    return docs.select(
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

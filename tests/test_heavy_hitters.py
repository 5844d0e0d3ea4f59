"""Misra-Gries frequent terms (operators/sketches.py): the classical
MG guarantees, asserted against exact counts with k forced small
enough to decrement heavily."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.functions.text import (
    tokens_col,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sketches import (
    frequent_terms,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR


def _exact_counts(docs):
    return {
        r["term"]: r["n"]
        for r in docs.select(F.explode(tokens_col("text")).alias("t"))
        .select(F.lower("t").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .collect()
    }


def test_mg_guarantees_vs_exact(spark):
    docs = load_table(spark, SF_DIR, "documents")
    exact = _exact_counts(docs)
    n_total = sum(exact.values())

    sketch = {
        r["term"]: (r["est_count"], r["max_undercount"])
        for r in frequent_terms(docs, k=8).collect()  # tiny k: force decrements
    }
    assert sketch, "sketch returned nothing"
    bounds = {b for (_, b) in sketch.values()}
    assert len(bounds) == 1  # one global bound
    bound = bounds.pop()
    assert 0 < bound < n_total  # decrements actually happened

    for term, (est, _) in sketch.items():
        true = exact[term]
        assert est <= true, (term, est, true)
        assert true - est <= bound, (term, est, true, bound)

    # completeness: every term more frequent than the decrement mass
    # must be present as a candidate
    for term, true in exact.items():
        if true > bound:
            assert term in sketch, (term, true, bound)


def test_mg_planted_heavy_hitter_and_min_share(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    planted = docs.sparkSession.createDataFrame(
        [(10**9, "zzzhot " * 5000)], "doc_id long, text string"
    )
    corpus = docs.union(planted)
    exact = _exact_counts(corpus)

    out = {
        r["term"]: r["est_count"]
        for r in frequent_terms(corpus, k=32, min_share=0.01).collect()
    }
    assert "zzzhot" in out
    assert out["zzzhot"] <= exact["zzzhot"] == 5000
    # min_share soundness: no term at/above 1% of occurrences is lost
    n_total = sum(exact.values())
    for term, true in exact.items():
        if true >= 0.01 * n_total:
            assert term in out, (term, true)

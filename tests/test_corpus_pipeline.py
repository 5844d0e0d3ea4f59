"""End-to-end corpus preparation: planted exact dup, near dup, and a
junk document must each fall out at the right stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.corpus import (
    prepare_corpus,
)

from .conftest import SF_DIR


def test_prepare_corpus_stages(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    planted = docs.unionByName(
        spark.createDataFrame(
            [
                # exact dup of doc 0 (same text modulo whitespace/case)
                (100001, None),
                # junk: punctuation soup, no stopwords → low quality
                (100002, "!!! ??? ... ;;; :::"),
                # tiny: below token floor
                (100003, "two words"),
            ],
            "doc_id long, text string",
        ).withColumn(
            "text",
            F.coalesce(
                "text",
                F.upper(
                    F.lit(docs.filter(F.col("doc_id") == 0).collect()[0]["text"])
                ),
            ),
        )
    )

    clean, report = prepare_corpus(planted, min_quality=0.3, min_tokens=3)
    stages = {r["stage"]: (r["rows_in"], r["rows_out"]) for r in report.collect()}

    n_in = planted.count()
    assert stages["input"] == (n_in, n_in)
    # the exact dup of doc 0 collapses
    assert stages["exact_dedup"][1] == n_in - 1
    # quality stage drops at least the junk + tiny docs
    assert stages["quality_filter"][1] <= stages["near_dedup"][1] - 2

    ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert 100001 not in ids and 100002 not in ids and 100003 not in ids
    assert 0 in ids
    # surviving docs carry a language tag
    assert clean.filter(F.col("lang_pred").isNull()).count() == 0

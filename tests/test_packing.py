"""Sequence packing invariants: determinism, budget overshoot bound,
contiguity of pack ids within a stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    packing,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR


def test_pack_overshoot_bound(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "n_chars")
    budget = 4000
    packed = packing.pack_sequences(docs, "n_chars", budget, stream_col="lang")
    stats = packing.pack_stats(packed, "n_chars", "lang").collect()
    max_doc = {
        r["lang"]: r["m"]
        for r in docs.groupBy("lang").agg(F.max("n_chars").alias("m")).collect()
    }
    for r in stats:
        # offset packing: a pack exceeds budget by less than one document
        assert r["total_cost"] < budget + max_doc[r["lang"]], r


def test_pack_ids_contiguous_and_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "n_chars")
    packed = packing.pack_sequences(docs, "n_chars", 4000, stream_col="lang")
    per_stream = {
        r["lang"]: sorted(r["ids"])
        for r in packed.groupBy("lang")
        .agg(F.collect_set("pack_id").alias("ids"))
        .collect()
    }
    for lang, ids in per_stream.items():
        assert ids == list(range(len(ids))), (lang, ids[:5], ids[-5:])
    again = packing.pack_sequences(docs, "n_chars", 4000, stream_col="lang")
    assert packed.exceptAll(again).count() == 0
    assert again.exceptAll(packed).count() == 0

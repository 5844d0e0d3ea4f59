"""Int8 embedding quantization: round-trip error bound and cosine
top-k stability after dequantization."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.functions import (
    vectors,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
    topk_cosine,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans.queries import (
    q_quantize_embeddings,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR


def test_roundtrip_error_within_half_scale(spark):
    emb = load_table(spark, SF_DIR, "embeddings").limit(200)
    q = emb.withColumn("scale", vectors.quantize_scale_col("embedding")).withColumn(
        "q8", vectors.quantize_int8_col("embedding", F.col("scale"))
    )
    rows = q.withColumn(
        "deq", vectors.dequantize_col("q8", F.col("scale"))
    ).select("embedding", "scale", "q8", "deq").collect()
    assert rows
    for r in rows:
        assert all(-127 <= v <= 127 for v in r["q8"])
        for orig, deq in zip(r["embedding"], r["deq"]):
            assert abs(orig - deq) <= r["scale"] / 2 + 1e-12


def test_topk_recall_after_quantization(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    deq = (
        emb.withColumn("scale", vectors.quantize_scale_col("embedding"))
        .withColumn("q8", vectors.quantize_int8_col("embedding", F.col("scale")))
        .select(
            "vec_id",
            vectors.dequantize_col("q8", F.col("scale"))
            .cast("array<float>")
            .alias("embedding"),
            "label",
        )
    )
    qid = emb.agg(F.min("vec_id")).collect()[0][0]
    exact = [r["vec_id"] for r in topk_cosine(emb, qid, k=10).collect()]
    quant = [r["vec_id"] for r in topk_cosine(deq, qid, k=10).collect()]
    overlap = len(set(exact) & set(quant)) / 10
    assert overlap >= 0.8, (overlap, exact, quant)


def test_driver_surface_json_is_parseable(spark):
    out = q_quantize_embeddings(spark, SF_DIR).limit(5).collect()
    for r in out:
        vals = json.loads(r["q8"])
        assert isinstance(vals, list) and all(isinstance(v, int) for v in vals)

"""Skew-salting helpers and IVF ANN recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    dedup,
    similarity,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.skew import (
    salted_agg,
    salted_join_skewed_left,
)

from .conftest import SF_DIR


def test_salted_agg_equals_plain_agg(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain = {
        r["l_returnflag"]: (r["c"], round(r["s"], 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("c"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["c"], round(r["s"], 2))
        for r in salted_agg(
            li,
            "l_returnflag",
            aggs=[F.count("*").alias("c"), F.sum("l_quantity").alias("s")],
            final_aggs=[F.sum("c").alias("c"), F.sum("s").alias("s")],
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain_join(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = li.join(o, "l_orderkey").count()
    salted = salted_join_skewed_left(li, o, "l_orderkey", salt_buckets=8).count()
    assert plain == salted


def test_ivf_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {r["vec_id"] for r in similarity.topk_cosine(emb, 0, 10).collect()}

    def recall(n_probe):
        approx = {
            r["vec_id"]
            for r in similarity.topk_cosine_ivf(
                emb, 0, 10, n_centroids=16, n_probe=n_probe
            ).collect()
        }
        return len(exact & approx) / 10

    # cheap setting keeps a useful floor; the tuned setting (what
    # q_topk_cosine_indexed ships with) must be near-exact
    assert recall(4) >= 0.7
    assert recall(8) >= 0.9


def test_hot_shingle_cap_preserves_high_pairs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, min_jaccard=0.5).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            docs, min_jaccard=0.5, max_shingle_doc_freq=400
        ).collect()
    }
    # a cap near corpus size must not drop any high-similarity pair here
    assert capped == uncapped

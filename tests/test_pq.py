"""Product quantization (operators/pq.py): code geometry, ADC scoring
exactness, determinism, and recall — plain ADC on clusterable data,
re-ranked ADC on the real embeddings table."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    pq,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
    topk_cosine,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR

M, K = 16, 64


def _emb(spark):
    return load_table(spark, str(SF_DIR), "embeddings")


def test_codes_shape_and_bounds(spark):
    emb = _emb(spark)
    books = pq.pq_train(emb, m=M, k=K, iters=2)
    codes = pq.pq_encode(emb, books)
    bad = codes.filter(
        (F.size("codes") != M)
        | F.exists("codes", lambda c: (c < 0) | (c >= K))
    )
    assert bad.count() == 0
    assert codes.count() == emb.count()


def test_train_is_deterministic(spark):
    emb = _emb(spark)
    a = pq.pq_train(emb, m=8, k=16, iters=3)
    b = pq.pq_train(emb, m=8, k=16, iters=3)
    assert a == b


def test_dim_not_divisible_raises(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_train(emb, m=7)


def test_adc_distance_matches_python_lookup(spark):
    """The JVM element_at scoring must equal a Python recompute of the
    same table lookups for every candidate."""
    emb = _emb(spark)
    books = pq.pq_train(emb, m=8, k=16, iters=2)
    codes = pq.pq_encode(emb, books)
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    got = {
        r["vec_id"]: r["approx_dist"]
        for r in pq.pq_topk(codes, books, q, topk=50).collect()
    }
    qn = np.linalg.norm(q) or 1.0
    qv = np.array(q) / qn
    dsub = len(books[0][0])
    table = [
        [
            float(((qv[s * dsub : (s + 1) * dsub] - np.array(cw)) ** 2).sum())
            for cw in books[s]
        ]
        for s in range(len(books))
    ]
    code_map = {
        r["vec_id"]: r["codes"] for r in codes.collect()
    }
    for vid, dist in got.items():
        exp = round(sum(table[s][code_map[vid][s]] for s in range(len(books))), 9)
        assert abs(dist - exp) < 1e-8, vid


def test_planted_clusters_plain_adc_recall(spark):
    """On clusterable data, raw ADC (no re-rank) must already rank the
    query's own cluster first: 10 well-separated centers, 20 members
    each, query = a member; its top-9 neighbors are its cluster."""
    rng = np.random.RandomState(7)
    centers = rng.normal(0, 1, (10, 64)) * 5
    rows = []
    for ci in range(10):
        for j in range(20):
            v = centers[ci] + rng.normal(0, 0.05, 64)
            rows.append((ci * 100 + j, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq.pq_train(emb, m=M, k=K, iters=4)
    codes = pq.pq_encode(emb, books)
    q = rows[0][1]  # member 0 of cluster 0
    got = [
        r["vec_id"]
        for r in pq.pq_topk(codes, books, q, topk=20).collect()
    ]
    same_cluster = sum(1 for v in got[:10] if v // 100 == 0)
    assert same_cluster >= 9


def test_rerank_recall_on_real_embeddings(spark):
    """The deployment form (ADC shortlist + exact re-rank) must reach
    recall@10 >= 0.85 vs brute-force cosine at a 10x shortlist."""
    emb = _emb(spark).cache()
    books = pq.pq_train(emb, m=M, k=K, iters=5)
    codes = pq.pq_encode(emb, books).cache()
    codes.count()
    recs = []
    for qid in range(5):
        qrow = emb.filter(F.col("vec_id") == qid).first()
        q = [float(x) for x in qrow["embedding"]]
        a = [
            r["vec_id"]
            for r in pq.pq_topk_rerank(
                codes, emb, books, q, topk=11, shortlist_factor=10
            ).collect()
            if r["vec_id"] != qid
        ][:10]
        e = [r["vec_id"] for r in topk_cosine(emb, qid, k=10).collect()]
        recs.append(len(set(a) & set(e)) / 10)
    codes.unpersist()
    emb.unpersist()
    assert sum(recs) / len(recs) >= 0.85, recs


def test_ivfpq_index_probe_prunes_and_recalls(spark, tmp_path):
    """The composed index: codes partitioned by coarse cell, probes
    carry a cell partition filter, and the re-ranked result reaches
    recall@10 >= 0.8 vs brute force at n_probe=8 of 16 cells."""
    import re

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.pq import (
        topk_ivfpq,
        write_ivfpq_index,
    )

    emb = _emb(spark).cache()
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, n_centroids=16, m=M, k=K, iters=3)

    qid = 3
    q = [float(x) for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]]
    out = topk_ivfpq(spark, path, emb, q, topk=11, n_probe=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[cell#\d+ IN \(", plan), plan

    got = [r["vec_id"] for r in out.collect() if r["vec_id"] != qid][:10]
    exact = [r["vec_id"] for r in topk_cosine(emb, qid, k=10).collect()]
    assert len(set(got) & set(exact)) / 10 >= 0.8
    emb.unpersist()


def test_ivfpq_append_with_stored_quantizers(spark, tmp_path):
    """Build on half the corpus, append the rest: appended entries land
    under the stored cells/codebooks and a probe over the grown index
    still recalls against brute force on the FULL corpus."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.pq import (
        append_to_ivfpq_index,
        topk_ivfpq,
        write_ivfpq_index,
    )

    emb = _emb(spark).cache()
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq_grow")
    write_ivfpq_index(half, path, n_centroids=16, m=M, k=K, iters=3)
    append_to_ivfpq_index(rest, path)

    total = spark.read.parquet(f"{path}/codes").count()
    assert total == emb.count()
    qid = 2
    q = [float(x) for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]]
    got = [
        r["vec_id"]
        for r in topk_ivfpq(spark, path, emb, q, topk=11, n_probe=8).collect()
        if r["vec_id"] != qid
    ][:10]
    exact = [r["vec_id"] for r in topk_cosine(emb, qid, k=10).collect()]
    assert len(set(got) & set(exact)) / 10 >= 0.7
    # odd ids (the appended half) must be findable
    assert any(v % 2 == 1 for v in got)
    emb.unpersist()


def test_ivfpq_append_rejects_dim_mismatch(spark, tmp_path):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.pq import (
        append_to_ivfpq_index,
        write_ivfpq_index,
    )

    emb = _emb(spark)
    path = str(tmp_path / "ivfpq_dim")
    write_ivfpq_index(emb.limit(50), path, n_centroids=8, m=8, k=16, iters=1)
    bad = emb.limit(5).select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    )
    with pytest.raises(ValueError, match="refusing to append"):
        append_to_ivfpq_index(bad, path)


def test_literal_adc_mixed_dim_raises(spark):
    """A mixed-length embedding must fail loudly (the jl_project
    guard), not NULL-pad zip_with into silent NULL distances."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    rows = [(i, [float(i + j) for j in range(8)]) for i in range(10)]
    rows.append((10, [1.0, 2.0]))  # short vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(SparkRuntimeException, match="embedding length must be 8"):
        pq.pq_literal_adc(df, m=4, k_code=4).collect()


def test_ivf_literal_probe_mixed_dim_raises(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        ivf_literal_probe,
    )

    rows = [(i, [float(i + j) for j in range(8)]) for i in range(10)]
    rows.append((10, [1.0, 2.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(SparkRuntimeException, match="embedding length must be 8"):
        ivf_literal_probe(df, k_cells=2, nprobe=2).collect()


def test_literal_twins_drop_null_vectors(spark):
    """A NULL embedding row must DROP (both engines filter it), never
    abort the query through the dim guard (r9 code-review finding)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.linalg import (
        jl_project,
        pca_literal_project,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        ivf_literal_probe,
    )

    rows = [(i, [float(i + j) for j in range(8)]) for i in range(10)]
    rows.append((10, None))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq.pq_literal_adc(df, m=4, k_code=4).collect()
    assert len(out) == 10 and all(r["vec_id"] != 10 for r in out)
    out = ivf_literal_probe(df, k_cells=2, nprobe=2, topk=20).collect()
    assert all(r["vec_id"] != 10 for r in out)
    out = pca_literal_project(df, q=4).collect()
    assert len(out) == 10
    out = jl_project(df, k_out=4, dim=8).collect()
    assert all(r["vec_id"] != 10 for r in out)

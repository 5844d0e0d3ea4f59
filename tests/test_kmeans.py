"""Lloyd's k-means: exact cluster recovery on separable planted data,
determinism, and the driver-facing query entry."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    similarity,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans import (
    QUERIES,
)

from .conftest import SF_DIR


def _planted(spark, n_per=40, dim=8):
    """3 well-separated centers (0, 100, 200 on every axis) with a
    small deterministic per-point jitter — separation >> jitter, so the
    optimal clustering is exactly id % 3."""
    rows = []
    for i in range(3 * n_per):
        c = i % 3
        jitter = (i % 7) * 0.01
        rows.append((i, [100.0 * c + jitter] * dim))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_recovers_planted_clusters(spark):
    emb = _planted(spark)
    assigned = similarity.kmeans_train_assign(emb, k=3, iters=4)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    # same planted group → same cluster; different groups → different
    label_of_group = {g: got[g] for g in range(3)}
    assert len(set(label_of_group.values())) == 3
    for vid, cl in got.items():
        assert cl == label_of_group[vid % 3], (vid, cl)


def test_kmeans_deterministic(spark):
    emb = _planted(spark)
    a = sorted(similarity.kmeans_train_assign(emb, k=3, iters=2).collect())
    b = sorted(similarity.kmeans_train_assign(emb, k=3, iters=2).collect())
    assert a == b


def test_kmeans_query_runs(spark):
    out = QUERIES["kmeans_assign"](spark, SF_DIR)
    rows = out.collect()
    assert {r["cluster"] for r in rows} <= set(range(8))
    n_vecs = (
        QUERIES["kmeans_assign"](spark, SF_DIR).select("vec_id").distinct().count()
    )
    assert len(rows) == n_vecs


def _planted_grid(spark, n_per=15, dim=6):
    """4 well-separated centers (0, 100, 200, 300 on every axis); the
    optimal k=4 clustering is exactly id % 4 — recoverable by a two-level
    (2×2) trainer because any coarse split keeps whole groups together."""
    rows = []
    for i in range(4 * n_per):
        c = i % 4
        jitter = (i % 5) * 0.01
        rows.append((i, [100.0 * c + jitter] * dim))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_two_level_recovers_planted_clusters(spark):
    emb = _planted_grid(spark)
    assigned = similarity.kmeans_two_level(emb, k1=2, k2=2, iters=4)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert len(got) == 4 * 15
    label_of_group = {g: got[g] for g in range(4)}
    # 4 planted groups → 4 distinct composite labels, all in [0, k1*k2)
    assert len(set(label_of_group.values())) == 4
    assert set(got.values()) <= set(range(4))
    for vid, cl in got.items():
        assert cl == label_of_group[vid % 4], (vid, cl)


def test_two_level_deterministic(spark):
    emb = _planted_grid(spark)
    a = sorted(similarity.kmeans_two_level(emb, k1=2, k2=2, iters=2).collect())
    b = sorted(similarity.kmeans_two_level(emb, k1=2, k2=2, iters=2).collect())
    assert a == b


def test_two_level_partitions_all_rows(spark):
    """Every input row gets exactly one composite label even when cells
    are short (k2 > smallest cell) — padding repeats the first member."""
    emb = _planted(spark)  # 3 groups, ask for k1=2, k2=4 (8 > 3 centers)
    assigned = similarity.kmeans_two_level(emb, k1=2, k2=4, iters=3)
    rows = assigned.collect()
    assert len(rows) == emb.count()
    assert len({r["vec_id"] for r in rows}) == len(rows)
    assert all(0 <= r["cluster"] < 8 for r in rows)


def test_two_level_matches_flat_quality(spark):
    """On separable data the hierarchical trainer's inertia is no worse
    than the flat trainer's at the same total k."""
    emb = _planted_grid(spark)

    def inertia(assigned):
        j = emb.join(assigned, "vec_id")
        per = j.select(
            "cluster", F.posexplode("embedding").alias("pos", "v")
        ).groupBy("cluster", "pos").agg(
            (F.avg(F.col("v") * F.col("v")) - F.avg("v") * F.avg("v")).alias("var")
        )
        return per.agg(F.sum("var").alias("s")).collect()[0]["s"] or 0.0

    flat = similarity.kmeans_train_assign(emb, k=4, iters=4)
    two = similarity.kmeans_two_level(emb, k1=2, k2=2, iters=4)
    assert inertia(two) <= inertia(flat) + 1e-6


def test_kmeans_improves_inertia(spark):
    """Training must not increase within-cluster variance vs the
    0-iteration init assignment."""
    emb = _planted(spark)

    def inertia(assigned):
        j = emb.join(assigned, "vec_id")
        per = j.select(
            "cluster", F.posexplode("embedding").alias("pos", "v")
        ).groupBy("cluster", "pos").agg(
            (F.avg(F.col("v") * F.col("v")) - F.avg("v") * F.avg("v")).alias("var")
        )
        return per.agg(F.sum("var").alias("s")).collect()[0]["s"]

    trained = similarity.kmeans_train_assign(emb, k=3, iters=4)
    init_only = similarity.kmeans_train_assign(emb, k=3, iters=0)
    assert inertia(trained) <= inertia(init_only) + 1e-9

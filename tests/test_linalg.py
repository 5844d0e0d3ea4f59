"""Distributed PCA (operators/linalg.py): the covariance-partials path
must reproduce numpy's single-machine answer exactly, and the registry
surface must be stable under repartitioning (the accumulation-order
hazard the integer quantization exists to kill)."""

from __future__ import annotations

import numpy as np
import pytest

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.linalg import (
    covariance_partials,
    pca_fit,
    pca_label_summary,
    pca_project,
)

from .conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_covariance_matches_numpy(spark):
    emb = _emb(spark)
    rows = emb.select("embedding").collect()
    x = np.asarray([r["embedding"] for r in rows], dtype=np.float64)

    parts = covariance_partials(emb, "embedding").collect()
    # one partial per non-empty partition, each d²+d+1 values — bounded
    # driver state regardless of row count
    assert len(parts) <= emb.rdd.getNumPartitions()
    d = x.shape[1]
    n = sum(p["n"] for p in parts)
    assert n == x.shape[0]
    s = sum(np.asarray(p["s"]) for p in parts)
    ss = sum(np.asarray(p["ss"]).reshape(d, d) for p in parts)
    # float32 inputs → every pairwise product exact in float64; partial
    # sums agree with numpy's to tight tolerance
    np.testing.assert_allclose(s, x.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(ss, x.T @ x, rtol=1e-12)


def test_pca_fit_matches_numpy_eigh(spark):
    emb = _emb(spark)
    rows = emb.select("embedding").collect()
    x = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    comps, evals, mean, n = pca_fit(emb, "embedding", q=4)

    assert n == x.shape[0]
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-9)

    cov = np.cov(x, rowvar=False)
    ref_evals, ref_evecs = np.linalg.eigh(cov)
    order = np.argsort(ref_evals)[::-1][:4]
    np.testing.assert_allclose(evals, ref_evals[order], rtol=1e-7)
    # eigenvectors match up to the fixed sign convention
    for i, j in enumerate(order):
        v = ref_evecs[:, j]
        k = int(np.argmax(np.abs(v)))
        if v[k] < 0:
            v = -v
        np.testing.assert_allclose(comps[i], v, atol=1e-7)
    # variance explained is sorted descending
    assert all(evals[i] >= evals[i + 1] for i in range(len(evals) - 1))


def test_projection_centers_scores(spark):
    emb = _emb(spark)
    proj = pca_project(emb, "embedding", q=2, out_col="sc").select("sc").collect()
    scores = np.asarray([r["sc"] for r in proj])
    # PCA scores are centered and uncorrelated; variance equals eigenvalue
    np.testing.assert_allclose(scores.mean(axis=0), 0.0, atol=1e-9)
    c = np.cov(scores, rowvar=False)
    assert abs(c[0, 1]) < 1e-6
    assert c[0, 0] >= c[1, 1]


def test_label_summary_stable_under_repartition(spark):
    emb = _emb(spark)
    a = pca_label_summary(emb, "embedding", "label", q=4)
    b = pca_label_summary(emb.repartition(7), "embedding", "label", q=4)
    ra = {r["label"]: r for r in a.collect()}
    rb = {r["label"]: r for r in b.collect()}
    assert set(ra) == set(rb)
    for lbl in ra:
        assert ra[lbl]["n"] == rb[lbl]["n"]
        for c in ("pc1", "pc2", "pc3", "pc4"):
            # integer-quantized sums → identical to the rounded digit
            assert ra[lbl][c] == pytest.approx(rb[lbl][c], abs=2e-6)


def test_pca_fit_rejects_empty(spark):
    emb = _emb(spark).filter("vec_id < 0")
    with pytest.raises(ValueError):
        pca_fit(emb, "embedding", q=2)


def test_zca_whitened_covariance_is_identity(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.linalg import (
        zca_whiten,
    )

    emb = _emb(spark)
    rows = zca_whiten(emb, "embedding", out_col="w").select("w").collect()
    x = np.asarray([r["w"] for r in rows])
    c = np.cov(x, rowvar=False)
    off = c - np.eye(c.shape[0])
    assert np.abs(off).max() < 1e-3, np.abs(off).max()


def test_pca_literal_project_matches_python_integer_matmul(spark):
    """Scores replay the exact integer algebra: quantize to e6,
    truncating mean of the 4 lowest-id seeds, centered dot per
    component."""
    import numpy as np

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.linalg import (
        pca_literal_project,
    )

    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(8).astype(float).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in pca_literal_project(df, q=4).collect()}

    f32 = {i: np.asarray(v, dtype=np.float32) for i, v in rows}
    vq = {i: [int(round(float(x) * 1e6)) for x in v] for i, v in f32.items()}
    seeds = [vq[i] for i in range(4)]

    def tdiv(a, b):
        return a // b if a >= 0 else -((-a) // b)

    mean = [tdiv(sum(s[d] for s in seeds), 4) for d in range(8)]
    for i, _v in rows:
        for j in range(4):
            want = sum(
                (vq[i][d] - mean[d]) * seeds[j][d] for d in range(8)
            )
            assert got[i][f"s{j}_e12"] == want, (i, j)


def test_pca_literal_project_mixed_dim_raises(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.linalg import (
        pca_literal_project,
    )

    rows = [(i, [float(i + j) for j in range(8)]) for i in range(10)]
    rows.append((10, [1.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(SparkRuntimeException, match="embedding length must be 8"):
        pca_literal_project(df, q=4).collect()

"""Materialized IVF index (operators/ann_index.py): layout, partition
pruning, and parity with the in-memory IVF probe."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.ann_index import (
    topk_cosine_indexed,
    write_ivf_index,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
    topk_cosine,
    topk_cosine_ivf,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR


def _index(spark, tmp_path, n_centroids=8):
    emb = load_table(spark, str(SF_DIR), "embeddings")
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, n_centroids=n_centroids)
    return emb, path


def test_index_layout_is_cell_partitioned(spark, tmp_path):
    emb, path = _index(spark, tmp_path)
    cell_dirs = glob.glob(f"{path}/vectors/cell=*")
    assert len(cell_dirs) >= 4  # every populated cell is its own directory
    total = spark.read.parquet(f"{path}/vectors").count()
    assert total == emb.count()


def test_probe_reads_only_probed_cells(spark, tmp_path):
    emb, path = _index(spark, tmp_path)
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    df = topk_cosine_indexed(spark, path, qvec, k=5, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(r"PartitionFilters: \[cell#\d+ IN \(", plan), plan
    # and the probed scan must actually return rows
    assert df.count() == 5


def test_indexed_probe_matches_inmemory_ivf(spark, tmp_path):
    emb, path = _index(spark, tmp_path, n_centroids=8)
    query_id = int(emb.orderBy("vec_id").first()["vec_id"])
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == query_id).first()["embedding"]
    ]
    # same quantizer + probe rule → identical candidate set; the indexed
    # variant keeps the query vector itself, so drop it before comparing
    mem = {
        (r["vec_id"], round(r["cos_sim"], 6))
        for r in topk_cosine_ivf(
            emb, query_id, k=6, n_centroids=8, n_probe=2
        ).collect()
    }
    idx = {
        (r["vec_id"], round(r["cos_sim"], 6))
        for r in topk_cosine_indexed(
            spark, path, qvec, k=7, n_probe=2
        ).collect()
        if r["vec_id"] != query_id
    }
    assert mem <= idx or idx <= mem, (mem, idx)


def test_indexed_probe_recall_vs_exact(spark, tmp_path):
    emb, path = _index(spark, tmp_path, n_centroids=8)
    query_id = int(emb.orderBy("vec_id").first()["vec_id"])
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == query_id).first()["embedding"]
    ]
    exact = {r["vec_id"] for r in topk_cosine(emb, query_id, k=10).collect()}

    def recall(n_probe):
        got = {
            r["vec_id"]
            for r in topk_cosine_indexed(
                spark, path, qvec, k=11, n_probe=n_probe
            ).collect()
            if r["vec_id"] != query_id
        }
        return len(exact & got) / len(exact)

    assert recall(4) >= 0.7
    # tuned probe width (what q_topk_cosine_indexed ships with)
    assert recall(8) >= 0.9


def test_auto_cell_count_follows_sqrt_rule(spark, tmp_path):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )
    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    path = str(tmp_path / "auto_ivf")
    write_ivf_index(emb, path)  # n_centroids=None -> sqrt(n) rule
    cells = spark.read.parquet(f"{path}/centroids").count()
    assert cells == max(16, int(n**0.5))
    # every vector landed in exactly one cell
    assert spark.read.parquet(f"{path}/vectors").count() == n


def test_append_uses_stored_centroids_and_extends_probes(spark, tmp_path):
    """Appended vectors land in the cells the INDEX's centroids imply
    (never re-derived from the batch) and immediately show up in
    probes; existing files are untouched."""
    import pytest

    emb, path = _index(spark, tmp_path, n_centroids=8)
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.ann_index import (
        append_to_ivf_index,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        assign_cells,
    )

    before_files = set(glob.glob(f"{path}/vectors/cell=*/*.parquet"))
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    # the appended batch: a near-copy of the query vector under new ids
    batch = emb.orderBy("vec_id").limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    append_to_ivf_index(batch, path)

    # historical files untouched (append, not rewrite)
    assert before_files <= set(glob.glob(f"{path}/vectors/cell=*/*.parquet"))
    # the new vector's on-disk cell equals the stored-centroid argmax
    cents = spark.read.parquet(f"{path}/centroids")
    expected_cell = assign_cells(batch, cents).first()["cell"]
    got = (
        spark.read.parquet(f"{path}/vectors")
        .filter(F.col("vec_id") == 1_000_000 + int(emb.orderBy("vec_id").first()["vec_id"]))
        .first()
    )
    assert got["cell"] == expected_cell
    # and the probe finds the near-copy at the top
    top = topk_cosine_indexed(spark, path, qvec, k=2, n_probe=2).collect()
    assert any(r["vec_id"] >= 1_000_000 for r in top)

    # dimensionality mismatch is refused, index untouched
    bad = spark.createDataFrame(
        [(2_000_000, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="refusing to append"):
        append_to_ivf_index(bad, path)

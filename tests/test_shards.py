"""Training-shard export (sources/shards.py): deterministic order,
balanced shards, trustworthy manifest."""

from __future__ import annotations

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.shards import (
    shard_manifest,
    write_training_shards,
)

from .conftest import SF_DIR


def test_shards_are_lossless_and_balanced(spark, tmp_path):
    docs = load_table(spark, str(SF_DIR), "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, num_shards=8)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }

    man = shard_manifest(spark, out).collect()
    assert len(man) == 8
    assert sum(r["n_rows"] for r in man) == docs.count()
    counts = [r["n_rows"] for r in man]
    # range partitioning on a uniform hash → roughly even shards
    assert max(counts) <= 2 * max(1, min(counts)), counts


def test_shuffle_order_is_deterministic_and_not_ingest_order(spark, tmp_path):
    docs = load_table(spark, str(SF_DIR), "documents")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, a, num_shards=4)
    write_training_shards(docs, b, num_shards=4)

    # the manifests of two independent writes agree shard-for-shard
    ma = shard_manifest(spark, a).collect()
    mb = shard_manifest(spark, b).collect()
    assert [(r["shard"].split("-")[1], r["n_rows"]) for r in ma] == [
        (r["shard"].split("-")[1], r["n_rows"]) for r in mb
    ]
    # within-shard order is the md5 order, not doc_id order
    import pyarrow.parquet as pq
    import glob

    first = sorted(glob.glob(f"{a}/*.parquet"))[0]
    ids = pq.read_table(first, columns=["doc_id"])["doc_id"].to_pylist()
    assert ids != sorted(ids)
    # and the per-shard membership is identical across the two writes
    firstb = sorted(glob.glob(f"{b}/*.parquet"))[0]
    idsb = pq.read_table(firstb, columns=["doc_id"])["doc_id"].to_pylist()
    assert ids == idsb

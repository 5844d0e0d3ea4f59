"""Materialized BM25 postings index (operators/text_index.py): layout,
two-level probe pruning, score parity with the corpus-scan form, and
append semantics."""

from __future__ import annotations

import glob
import re

import pytest
from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.retrieval import (
    bm25_topk,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.text_index import (
    _bucket_of,
    append_to_text_index,
    bm25_search_indexed,
    write_text_index,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR

QUERY = ["vector", "hash", "join"]


def _index(spark, tmp_path, n_buckets=16):
    docs = load_table(spark, str(SF_DIR), "documents")
    path = str(tmp_path / "bm25")
    write_text_index(docs, path, n_buckets=n_buckets)
    return docs, path


def _rows(df):
    return [
        (r["doc_id"], r["score"], r["rnk"])
        for r in df.orderBy("rnk").collect()
    ]


def test_layout_is_bucket_partitioned_with_sidecars(spark, tmp_path):
    docs, path = _index(spark, tmp_path)
    # initial build owns batch_id=0; every append owns its own batch dir
    assert glob.glob(f"{path}/postings/batch_id=0/bucket=*")
    assert glob.glob(f"{path}/terms/bucket=*")
    meta = spark.read.parquet(f"{path}/_meta").first()
    assert meta["n_docs"] == docs.count()
    assert meta["n_buckets"] == 16


def test_probe_matches_corpus_scan_exactly(spark, tmp_path):
    docs, path = _index(spark, tmp_path)
    via_index = _rows(bm25_search_indexed(spark, path, QUERY, k=10))
    via_scan = _rows(bm25_topk(docs, QUERY, k=10))
    assert via_index == via_scan
    assert len(via_index) == 10


def test_probe_prunes_to_query_buckets(spark, tmp_path):
    docs, path = _index(spark, tmp_path)
    df = bm25_search_indexed(spark, path, QUERY, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[bucket#\d+ IN \(", plan), plan
    # the literal bucket list is exactly the query terms' buckets
    expect = sorted({_bucket_of(t, 16) for t in QUERY})
    m = re.search(r"PartitionFilters: \[bucket#\d+ IN \(([0-9,]+)\)", plan)
    assert m and sorted(int(x) for x in m.group(1).split(",")) == expect


def test_append_keeps_parity_and_exact_idf(spark, tmp_path):
    docs, path = _index(spark, tmp_path)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    path2 = str(tmp_path / "bm25_grow")
    write_text_index(old, path2, n_buckets=16)
    append_to_text_index(new, path2)
    # after the append, probing the grown index must equal scanning the
    # FULL corpus — both the postings and the rebuilt df/N/avgdl
    via_index = _rows(bm25_search_indexed(spark, path2, QUERY, k=10))
    via_scan = _rows(bm25_topk(docs, QUERY, k=10))
    assert via_index == via_scan


def test_append_requires_meta_sidecar(spark, tmp_path):
    docs = load_table(spark, str(SF_DIR), "documents")
    path = str(tmp_path / "nometa")
    write_text_index(docs.limit(10), path, n_buckets=4)
    import shutil

    shutil.rmtree(f"{path}/_meta")
    with pytest.raises(Exception):
        append_to_text_index(docs.limit(5), path)


def test_repeated_query_terms_and_case_fold(spark, tmp_path):
    docs, path = _index(spark, tmp_path)
    a = _rows(bm25_search_indexed(spark, path, ["Vector", "vector"], k=5))
    b = _rows(bm25_search_indexed(spark, path, ["vector"], k=5))
    assert a == b


def test_streaming_index_maintenance_matches_scan(spark, tmp_path):
    """Stream the corpus in as JSON-lines files: after the stream
    drains, probing the maintained index must equal the corpus scan
    over everything ingested — across the build batch, appends, and a
    SIMULATED RETRY of a batch (at-least-once foreachBatch)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.streaming.text_index_stream import (
        _index_batch,
        start_text_index_stream,
    )

    docs = load_table(spark, str(SF_DIR), "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_feed")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    half.coalesce(1).write.json(f"{src}/f0.json")
    rest.coalesce(1).write.json(f"{src}/f1.json")

    index_dir = str(tmp_path / "stream_index")
    ckpt = str(tmp_path / "stream_index_ckpt")
    q = start_text_index_stream(
        spark, f"{src}/f*.json", index_dir, ckpt,
        n_buckets=16, max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    def rows(df):
        return [(r["doc_id"], r["score"], r["rnk"]) for r in df.orderBy("rnk").collect()]

    got = rows(bm25_search_indexed(spark, index_dir, QUERY, k=10))
    exp = rows(bm25_topk(docs, QUERY, k=10))
    assert got == exp

    # retry the LAST batch (same batch_id, same rows): postings must be
    # replaced, not duplicated, and the probe unchanged
    max_bid = (
        spark.read.parquet(f"{index_dir}/postings")
        .agg(F.max("batch_id"))
        .first()[0]
    )
    retried = spark.read.json(f"{src}/f1.json")
    _index_batch(spark, retried, int(max_bid), index_dir, 16)
    assert rows(bm25_search_indexed(spark, index_dir, QUERY, k=10)) == exp


def test_compaction_preserves_probes_and_merges_batches(spark, tmp_path):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.text_index import (
        compact_text_index,
    )

    docs = load_table(spark, str(SF_DIR), "documents")
    path = str(tmp_path / "bm25_compact")
    thirds = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    write_text_index(thirds[0], path, n_buckets=8)
    append_to_text_index(thirds[1], path)
    append_to_text_index(thirds[2], path)

    before = _rows(bm25_search_indexed(spark, path, QUERY, k=10))
    n_post = spark.read.parquet(f"{path}/postings").count()

    import glob

    assert len(glob.glob(f"{path}/postings/batch_id=*")) == 3
    n = compact_text_index(spark, path)
    assert n == n_post
    assert glob.glob(f"{path}/postings/batch_id=*") == [
        f"{path}/postings/batch_id=0"
    ]
    after = _rows(bm25_search_indexed(spark, path, QUERY, k=10))
    assert after == before
    # and the compacted index still equals the full corpus scan
    assert after == _rows(bm25_topk(docs, QUERY, k=10))

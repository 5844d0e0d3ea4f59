"""Incremental MinHash index (operators/dedup_index.py): build, probe,
append — and the no-index-shuffle plan shape that makes it scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup_index import (
    append_to_minhash_index,
    probe_minhash_index,
    write_minhash_index,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR

BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while seventeen sleepy turtles watch from a mossy log in the sun"
)


def _corpus(spark):
    docs = load_table(spark, str(SF_DIR), "documents").select("doc_id", "text")
    planted = spark.createDataFrame(
        [(100001, BASE_TEXT)], "doc_id long, text string"
    )
    return docs.union(planted)


def _batch(spark):
    # 200001 is a near-dup of indexed 100001 (one word changed);
    # 200002/200003 are near-dups of each other but novel vs the corpus
    return spark.createDataFrame(
        [
            (200001, BASE_TEXT.replace("seventeen", "eighteen")),
            (200002, "completely novel content about distributed query engines " * 4),
            (
                200003,
                "completely novel content about distributed query engines "
                + "completely novel content about distributed query engines " * 3,
            ),
        ],
        "doc_id long, text string",
    )


def test_probe_finds_corpus_near_dup_only(spark, tmp_path):
    path = str(tmp_path / "mh_index")
    write_minhash_index(_corpus(spark), path)
    got = probe_minhash_index(_batch(spark), path, min_est_jaccard=0.5).collect()
    assert {(r.id_new, r.id_corpus) for r in got} == {(200001, 100001)}
    assert got[0].est_jaccard >= 0.5


def test_probe_broadcasts_batch_never_shuffles_index(spark, tmp_path):
    path = str(tmp_path / "mh_index")
    write_minhash_index(_corpus(spark), path)
    df = probe_minhash_index(_batch(spark), path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only hash-partitioning exchange is the candidate-pair
    # dropDuplicates — the index scan feeds the broadcast join directly
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_append_extends_the_corpus(spark, tmp_path):
    path = str(tmp_path / "mh_index")
    write_minhash_index(_corpus(spark), path)
    batch = _batch(spark)
    append_to_minhash_index(batch, path)
    # a second batch near-duplicating doc 200002 now hits the index
    second = spark.createDataFrame(
        [(300001, "completely novel content about distributed query engines " * 4)],
        "doc_id long, text string",
    )
    got = probe_minhash_index(second, path, min_est_jaccard=0.5).collect()
    hits = {r.id_corpus for r in got}
    assert 200002 in hits and 200003 in hits
    assert all(r.id_new == 300001 for r in got)


def test_probe_does_not_match_identical_ids(spark, tmp_path):
    # re-probing an already-indexed batch must not pair docs with themselves
    path = str(tmp_path / "mh_index")
    batch = _batch(spark)
    write_minhash_index(_corpus(spark), path)
    append_to_minhash_index(batch, path)
    got = probe_minhash_index(batch, path, min_est_jaccard=0.99).collect()
    assert all(r.id_new != r.id_corpus for r in got)


def test_probe_uses_index_meta_not_caller_params(spark, tmp_path):
    """An index built with non-default banding must probe correctly
    even when the caller passes (wrong) defaults — the _meta sidecar
    is authoritative."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )
    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    path = str(tmp_path / "idx_meta")
    write_minhash_index(docs, path, num_perm=16, bands=4)

    # probe the same docs under shifted ids: every doc is a near-dup of
    # its indexed twin; with mismatched parameters this would be ~empty
    probe = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    hits = probe_minhash_index(probe, path, min_est_jaccard=0.9)
    assert hits.count() >= 45  # identical text -> est_jaccard 1.0


def test_corrupt_meta_fails_append_loudly(spark, tmp_path):
    """A transiently unreadable _meta sidecar must FAIL the append, not
    skip validation and re-stamp the sidecar with the caller's params —
    that path lets a mismatched append corrupt the index while marking
    it consistent. Only a genuinely missing sidecar may pass."""
    import glob

    import pytest

    path = str(tmp_path / "idx")
    write_minhash_index(_corpus(spark), path, num_perm=64, bands=16)
    # corrupt every parquet part in the sidecar (bad footer)
    parts = glob.glob(f"{path}/_meta/*.parquet")
    assert parts
    for part in parts:
        with open(part, "wb") as f:
            f.write(b"not a parquet file")
    with pytest.raises(Exception) as ei:
        append_to_minhash_index(_batch(spark), path, num_perm=64, bands=16)
    assert "refusing to append" not in str(ei.value)
    # the sidecar must NOT have been re-stamped as consistent
    with open(parts[0], "rb") as f:
        assert f.read() == b"not a parquet file"


def test_band_partition_compaction_preserves_probes(spark, tmp_path):
    """The small-file story the index docstring promises: appends
    accrete files per band partition; sources.layout.compact_files
    over a band directory merges them without changing a single probe
    result (the hive dir name carries band_id, so rewriting files
    inside it is invisible to the reader)."""
    import glob

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.layout import (
        compact_files,
    )

    path = str(tmp_path / "idx")
    write_minhash_index(_corpus(spark), path)
    append_to_minhash_index(_batch(spark), path)
    # another distinct batch to accrete more files
    append_to_minhash_index(
        _batch(spark).withColumn("doc_id", F.col("doc_id") + 1000), path
    )

    probe = _batch(spark).withColumn("doc_id", F.col("doc_id") + 500_000)
    before = {
        (r["id_new"], r["id_corpus"], r["est_jaccard"])
        for r in probe_minhash_index(probe, path, min_est_jaccard=0.5).collect()
    }
    assert before  # the probe finds the indexed near-dups

    band_dirs = sorted(glob.glob(f"{path}/band_id=*"))
    assert band_dirs
    files_before = len(glob.glob(f"{path}/band_id=*/*.parquet"))
    for d in band_dirs:
        compact_files(spark, d, target_file_mb=128)
    files_after = len(glob.glob(f"{path}/band_id=*/*.parquet"))
    assert files_after < files_before
    assert files_after == len(band_dirs)  # tiny data -> one file per band

    after = {
        (r["id_new"], r["id_corpus"], r["est_jaccard"])
        for r in probe_minhash_index(probe, path, min_est_jaccard=0.5).collect()
    }
    assert after == before


def test_probe_bucket_cap_survives_boilerplate_corpus(spark, tmp_path):
    """A corpus dominated by one boilerplate text class must not turn
    the probe into an all-pairs explosion: with max_index_bucket_size
    the hot buckets are excluded (one counting agg over the index),
    while near-dups of ordinary docs are still found through their
    calm buckets."""
    boiler = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.lit("terms of service apply to all content on this site "
              "all rights reserved contact the administrator").alias("text"),
    )
    normal = spark.createDataFrame(
        [(100001, BASE_TEXT)], "doc_id long, text string"
    )
    path = str(tmp_path / "idx")
    write_minhash_index(boiler.union(normal), path)

    batch = spark.createDataFrame(
        [
            # near-dup of the ordinary indexed doc -> must be found
            (200001, BASE_TEXT.replace("seventeen", "eighteen")),
            # boilerplate copy -> its buckets are hot, gets dropped
            (200002, "terms of service apply to all content on this site "
                     "all rights reserved contact the administrator"),
        ],
        "doc_id long, text string",
    )
    hits = probe_minhash_index(
        batch, path, min_est_jaccard=0.5, max_index_bucket_size=100
    ).collect()
    pairs = {(r["id_new"], r["id_corpus"]) for r in hits}
    assert (200001, 100001) in pairs
    # the boilerplate batch doc matched nothing: every one of its
    # buckets exceeded the cap — and crucially the result is 1 row,
    # not 5000
    assert all(new_id != 200002 for new_id, _ in pairs)
    assert len(pairs) == 1


def test_probe_pushes_batch_hashes_into_index_scan(spark, tmp_path):
    """The probe's batch-hash In predicate must reach the parquet scan
    (row-group min/max + bloom skipping over the band_hash-clustered
    files) — the scan-pruning that keeps probe cost tracking the batch
    at 100 TB, not the index."""
    path = str(tmp_path / "idx")
    write_minhash_index(_corpus(spark), path)
    df = probe_minhash_index(_batch(spark), path, min_est_jaccard=0.5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(band_hash" in plan, plan

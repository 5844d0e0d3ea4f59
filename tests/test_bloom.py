"""Bloom-pre-filtered anti-join: exact left_anti semantics, effective
pre-filtering, and a shuffle-free probe side (operators/bloom.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.bloom import (
    bloom_anti_join,
    bloom_bitmap,
    bloom_build,
    bloom_might_contain,
    bloom_params,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans.standins import (
    files_df,
    ledger_df,
)

from .conftest import SF_DIR


def test_bloom_anti_join_matches_exact_anti_join(spark):
    """Same rows as the plain left_anti on the F2 stand-in census."""
    cand = files_df(spark, SF_DIR).select("file_key", "file_name")
    done = (
        ledger_df(spark, SF_DIR)
        .filter(F.col("status") == "done")
        .select(F.col("file_key").alias("fk"))
        .withColumnRenamed("fk", "file_key")
    )
    exact = set(
        r.file_key
        for r in cand.join(done, "file_key", "left_anti").collect()
    )
    got = bloom_anti_join(cand, done, "file_key", fpp=0.05).collect()
    assert set(r.file_key for r in got) == exact
    # no duplicated rows from the union of the two branches
    assert len(got) == len(exact)


def test_no_false_negatives_planted_overlap(spark):
    left = spark.range(0, 2000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k")
    )
    right = spark.range(0, 2000, 4).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k")
    )
    out = bloom_anti_join(left, right, "k").collect()
    kept = set(r.k for r in out)
    # every planted member was removed; exactly the non-members remain
    assert kept == {f"k{i}" for i in range(2000) if i % 4 != 0}


def test_prefilter_rules_out_most_disjoint_probes(spark):
    """On disjoint key sets the sketch flags ~fpp of probes, so the
    exact-join remnant is small — the whole point at 100 TB."""
    right = spark.range(0, 5000).select(
        F.concat(F.lit("r"), F.col("id").cast("string")).alias("k")
    )
    probe = spark.range(0, 5000).select(
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("k")
    )
    num_bits, num_hashes = bloom_params(5000, fpp=0.02)
    bm = bloom_bitmap(bloom_build(right, "k", num_bits, num_hashes), num_bits)
    flagged = (
        bloom_might_contain(probe, "k", bm, num_bits, num_hashes)
        .filter(F.col("might_contain"))
        .count()
    )
    # generous 3x headroom over the configured 2% fpp
    assert flagged <= 0.06 * 5000, flagged


def test_probe_side_never_shuffles(spark):
    probe = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
    right = spark.range(0, 10).select(F.col("id").cast("string").alias("k"))
    num_bits, num_hashes = bloom_params(10)
    bm = bloom_bitmap(bloom_build(right, "k", num_bits, num_hashes), num_bits)
    plan = (
        bloom_might_contain(probe, "k", bm, num_bits, num_hashes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_empty_right_keeps_everything(spark):
    left = spark.range(0, 50).select(F.col("id").cast("string").alias("k"))
    right = left.filter(F.lit(False))
    assert bloom_anti_join(left, right, "k").count() == 50

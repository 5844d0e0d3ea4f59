"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the package; this file only adapts it to the
driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans import (
    ORACLE_SQL,
    QUERIES,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["tpch_q1"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query.

    Registry layout: the first 50 entries are all oracle-backed (the
    driver's checked window). The window is selected BY NAME
    (plans/queries.py R9_WINDOW) and guarded at import time — a
    mis-rotated registry (window name missing, not oracle-backed, or
    wrong length) raises ImportError before the driver runs anything.
    Round-9 window: the 7 round-9 additions (pca_literal_project,
    bpe_literal_encode, sprt_daily_ledger, embedding_centroid_drift,
    time_split_embargo, dedup_survivor_select, length_curriculum),
    the 13 round-8 tail
    queries that landed after the r8 window froze
    (vocab_coverage_estimate … embedding_distance_profile — never
    driver-witnessed), the 4 queries rewritten or semantics-touched
    since their last witness (trimmed_mean's tie-group rewrite;
    kruskal_wallis's NULL-unit filter; the pq/ivf literal twins' dim
    guards), the 3 round-9 code-review closures re-witnessed after
    their NULL-handling fixes (quality_quantile_normalize,
    kmeans_literal_assign, jl_project), then 23 backfill slots for
    the queries whose driver evidence was oldest per the
    CORRECTNESS_r01–r08 history (the r2 sampling/text block, the full
    r3 block, and the head of the r4 graph/stats families; the four
    r1-witnessed names were renamed in r2). Past the
    window sit the rows-only entries and the remaining oracle-backed
    ones (every ORACLE_SQL key past registry position 50 —
    tests/test_queries_oracle.py runs the identical parity check on
    all of them, so the full oracle surface is verified either by the
    driver or by pytest);
    keys absent here entirely (near_dedup, near_dup_clusters,
    simhash_near_dup, embedding_near_dup, topk_cosine_lsh,
    topk_cosine_ivf, topk_cosine_indexed, neardup_index_probe,
    media_decode_stats, frequent_terms, kmeans_assign,
    approx_distinct, lm_score, bloom_anti_join, approx_quantiles)
    are engine-hash /
    literal-hyperplane / sketch / iterative-state / byte-decode
    dependent; the driver records rows-only checks and tests/ assert
    their quality against exact baselines (recall bounds, planted
    duplicates, recursive-CTE component parity, DuckDB closed-form
    mixing-rate parity, HLL/GK error bounds).
    """
    return dict(ORACLE_SQL)

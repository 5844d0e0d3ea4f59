"""Local mirror of the driver's DuckDB-oracle correctness gate.

For every query with an oracle, run the Spark plan and the DuckDB SQL on
the same sf0.001 parquet and require identical row sets (columns sorted
by name, rows sorted, tight float tolerance). Catching a mismatch here
means catching it before CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import pandas as pd
import pytest

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans import (
    ORACLE_SQL,
    QUERIES,
)

from .conftest import SF_DIR


def _type_category(type_str: str) -> str:
    """Coarse type family for Spark<->DuckDB parity.

    The driver's value hash is width-sensitive (a DuckDB HUGEINT sum
    hashes differently from a Spark BIGINT even when the values are
    equal — the exact bug behind the r3 `tpch_q12`/`term_divergence`
    failures), while pandas-based comparison silently coerces both to
    int64. So before comparing values we require every oracle column
    to be *representable* in the Spark column's family."""
    t = type_str.strip().lower()
    if t.startswith("decimal"):
        return "decimal"
    if t in {"tinyint", "smallint", "int", "integer", "bigint", "long", "short", "byte",
             "utinyint", "usmallint", "uinteger", "ubigint"}:
        return "int"
    if t in {"float", "double", "real"}:
        return "float"
    if t in {"string", "varchar", "text", "json"}:
        # DuckDB's to_json returns the JSON logical type, which reaches
        # pandas/the driver as a plain string — same hash family
        return "string"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "date":
        return "date"
    if t in {"boolean", "bool"}:
        return "bool"
    return t


def assert_oracle_dtypes_representable(name, spark_df, duck_rel):
    """Fail when a DuckDB oracle column cannot round-trip into the
    Spark column's type without narrowing (HUGEINT/INT128, UBIGINT,
    oversized DECIMAL) or sits in a different type family entirely."""
    spark_types = dict(spark_df.dtypes)
    duck_types = {c: str(t) for c, t in zip(duck_rel.columns, duck_rel.types)}
    for col in spark_types:
        dt = duck_types.get(col)
        if dt is None:
            continue
        dtl = dt.lower()
        assert "hugeint" not in dtl, (
            f"{name}.{col}: oracle returns {dt} (int128) — not representable as "
            f"Spark {spark_types[col]}; CAST the SQL aggregate to BIGINT"
        )
        assert dtl != "ubigint", (
            f"{name}.{col}: oracle returns {dt} — exceeds Spark bigint range"
        )
        assert _type_category(dt) == _type_category(spark_types[col]), (
            f"{name}.{col}: oracle type {dt} vs Spark type {spark_types[col]} "
            f"are different families — the driver's value hash will mismatch"
        )


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_DIR)
    duck_rel = duck.sql(ORACLE_SQL[name])
    assert_oracle_dtypes_representable(name, spark_df, duck_rel)
    spark_pdf = spark_df.toPandas()
    duck_pdf = duck_rel.df()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), name
    assert len(spark_pdf) == len(duck_pdf), f"{name}: {len(spark_pdf)} vs {len(duck_pdf)}"
    a, b = canonical(spark_pdf), canonical(duck_pdf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-9)


def test_window_prefix_is_oracle_backed():
    """Driver contract: the correctness harness checks only the first 50
    registry entries, so every one of those positions must carry an oracle."""
    prefix = list(QUERIES)[:50]
    missing = [n for n in prefix if n not in ORACLE_SQL]
    assert not missing, f"non-oracle queries inside the 50-entry window: {missing}"


def test_all_queries_run(spark):
    """Queries without an oracle still must run and return a stable schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(5).collect()


def test_bench_headline_is_subset_of_registry():
    """Every bench HEADLINE entry must exist in the registry — a
    renamed/removed query would otherwise only fail at bench runtime,
    i.e. in the driver's per-round artifact instead of in CI."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"bench.HEADLINE names not in QUERIES: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headline"


def test_bench_isolates_failing_queries(spark):
    """VERDICT r4 item 2: one crashing query must not void the bench
    artifact. A deliberately-broken query records an error, every other
    query still gets a timing, and the compact stdout line stays
    parseable JSON with the failure named."""
    import json

    import bench

    def boom(_spark, _sf_dir):
        raise RuntimeError("deliberately broken")

    queries = {
        "per_file_count": QUERIES["per_file_count"],
        "broken_query": boom,
        "exact_dedup": QUERIES["exact_dedup"],
    }
    headline = ["per_file_count", "broken_query", "exact_dedup"]
    detail, errors = bench.run_bench(
        spark, queries, headline, SF_DIR, sf=0.001, passes=2
    )
    assert set(errors) == {"broken_query"}
    assert "deliberately broken" in errors["broken_query"]
    assert set(detail["queries"]) == {"per_file_count", "exact_dedup"}
    assert detail["value"] > 0
    line = bench.compact_line(detail, headline, "unused.json")
    parsed = json.loads(line)
    assert parsed["failed"] == ["broken_query"]
    assert parsed["metric"] == "headline_queries_total_wall"

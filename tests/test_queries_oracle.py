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


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(ORACLE_SQL[name]).df()

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

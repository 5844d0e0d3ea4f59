"""Parquet table source for the driver's synthetic testdata
(`/root/testdata/sf*/{table}.parquet`, see TESTDATA.md).

Columnar scans get predicate pushdown + column pruning from Catalyst for
free as long as callers express filters/projections declaratively — every
operator in this engine does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
# reader rejects; read them as raw nanos and truncate to micros (matching
# DuckDB's read of the same files).
_NANO_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    nano_cols = _NANO_TS_COLS.get(name, ())
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in nano_cols:
        if isinstance(df.schema[c].dataType, T.LongType):
            # epoch nanos → naive (NTZ) timestamp at micro precision,
            # independent of the session timezone — matching both the
            # other tables (parquet µs/ms read as timestamp_ntz) and
            # DuckDB's naive read of the same column
            df = df.withColumn(
                c,
                F.expr(
                    f"timestampadd(MICROSECOND, {c} div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

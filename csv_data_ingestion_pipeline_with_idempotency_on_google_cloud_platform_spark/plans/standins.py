"""Deterministic stand-in views over the driver's synthetic tables.

The reference operates on (files, ledger, transitions) — none of which
exist in the driver testdata — so the correctness harness derives them
deterministically from `orders` / `lineitem` (FIXTURES.md §5: orders
stand in for files+ledger, lineitem lines stand in for per-file
transitions). Every DataFrame builder here has an exactly-equivalent
DuckDB SQL fragment used by `oracle_sql()`; keep the two in lockstep.

Mapping:
- a file        := an orders row  (bucket/name/size/created derived)
- ledger row    := a file + status cycling over file_key % 4
- a transition  := a lineitem row (seq = l_linenumber, ts = l_shipdate)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.keys import upload_id_col
from ..sources.parquet_source import load_table
from ..utils import parallelize_narrow

# ---------------------------------------------------------------- files

FILES_SQL = """
  SELECT o_orderkey AS file_key,
         'bucket-' || CAST(o_orderkey % 10 AS VARCHAR) AS bucket_name,
         'file_' || CAST(o_orderkey AS VARCHAR) ||
           CASE WHEN o_orderkey % 7 = 0 THEN '.txt'
                WHEN o_orderkey % 5 = 0 THEN '.CSV'
                ELSE '.csv' END AS file_name,
         CAST(FLOOR(o_totalprice) AS BIGINT) AS file_size,
         o_orderdate AS time_created
  FROM orders
"""


def files_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sha256 derivation downstream is compute-bound; spread the
    # single-file testdata scan across cores
    o = parallelize_narrow(load_table(spark, sf_dir, "orders"))
    k = F.col("o_orderkey")
    ext = (
        F.when(k % 7 == 0, ".txt").when(k % 5 == 0, ".CSV").otherwise(".csv")
    )
    return o.select(
        k.alias("file_key"),
        F.concat(F.lit("bucket-"), (k % 10).cast("string")).alias("bucket_name"),
        F.concat(F.lit("file_"), k.cast("string"), ext).alias("file_name"),
        F.floor("o_totalprice").cast("long").alias("file_size"),
        F.col("o_orderdate").alias("time_created"),
    )


# DuckDB twin of functions.keys.upload_id_col (sha256 hex is lowercase in
# both engines; strftime mirrors Spark's date_format ISO pattern).
UPLOAD_ID_SQL = (
    "substring(sha256(concat_ws('-', bucket_name, file_name, "
    "CAST(file_size AS VARCHAR), "
    "coalesce(strftime(time_created, '%Y-%m-%dT%H:%M:%S'), ''))), 1, 16)"
)

# --------------------------------------------------------------- ledger

LEDGER_SQL = f"""
  SELECT file_key,
         {UPLOAD_ID_SQL} AS upload_id,
         bucket_name, file_name, file_size,
         CASE file_key % 4 WHEN 0 THEN 'done' WHEN 1 THEN 'pending'
                           WHEN 2 THEN 'processing' ELSE 'failed' END AS status,
         time_created AS queued_at
  FROM ({FILES_SQL})
"""


def ledger_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = files_df(spark, sf_dir)
    k = F.col("file_key")
    status = (
        F.when(k % 4 == 0, "done")
        .when(k % 4 == 1, "pending")
        .when(k % 4 == 2, "processing")
        .otherwise("failed")
    )
    return f.select(
        "file_key",
        upload_id_col().alias("upload_id"),
        "bucket_name",
        "file_name",
        "file_size",
        status.alias("status"),
        F.col("time_created").alias("queued_at"),
    )


# ---------------------------------------------------------- transitions

TRANSITIONS_SQL = """
  SELECT l_orderkey AS upload_key,
         l_linenumber AS seq,
         CASE WHEN l_linenumber = 1 THEN 'pending'
              WHEN l_linenumber = 2 THEN 'processing'
              WHEN l_orderkey % 3 = 0 THEN 'failed'
              ELSE 'done' END AS status,
         l_shipdate AS ts
  FROM lineitem
"""


def transitions_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    seq = F.col("l_linenumber")
    status = (
        F.when(seq == 1, "pending")
        .when(seq == 2, "processing")
        .when(F.col("l_orderkey") % 3 == 0, "failed")
        .otherwise("done")
    )
    return li.select(
        F.col("l_orderkey").alias("upload_key"),
        seq.alias("seq"),
        status.alias("status"),
        F.col("l_shipdate").alias("ts"),
    )

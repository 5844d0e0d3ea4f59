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


# ------------------------------------------------------------- partsupp
# The driver testdata has no partsupp table, which TPC-H Q2/Q9/Q11/Q20
# need. Derive one deterministically from `part` (same recipe as the
# files/ledger stand-ins above): each part gets 4 supplier rows at
# 25-apart supplier-key offsets — so the 4 keys per part are always
# distinct over the 100-supplier key space — with integer-valued
# availqty/supplycost both engines compute with exact integer
# arithmetic (no float derivation, no rounding ambiguity).

PARTSUPP_SQL = """
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 7 + j * 25) % 100 AS ps_suppkey,
         (p_partkey * 17 + ((p_partkey * 7 + j * 25) % 100) * 31) % 9999 + 1
           AS ps_availqty,
         CAST((p_partkey * 13 + ((p_partkey * 7 + j * 25) % 100) * 7) % 900 + 1
              AS DECIMAL(18,6)) AS ps_supplycost
  FROM part CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
"""


def partsupp_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    ps = p.select(
        "p_partkey",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("j"),
    )
    sk = (F.col("p_partkey") * 7 + F.col("j") * 25) % 100
    return ps.select(
        F.col("p_partkey").alias("ps_partkey"),
        sk.alias("ps_suppkey"),
        ((F.col("p_partkey") * 17 + sk * 31) % 9999 + 1).alias("ps_availqty"),
        ((F.col("p_partkey") * 13 + sk * 7) % 900 + 1)
        .cast("decimal(18,6)")
        .alias("ps_supplycost"),
    )

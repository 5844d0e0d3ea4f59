"""SparkSession factory tuned for the engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default ``*``); the
config choices below are the ones that matter at cluster scale:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy)
- shuffle partitions sized for the test scale (32 locally; at 100 TB this
  would be set to ~2-3x total executor cores, or left to AQE's
  ``spark.sql.adaptive.coalescePartitions`` with a high initial value)
- UTC session timezone so timestamp semantics are deterministic
- Arrow enabled so any Pandas-UDF path is vectorized, never row-at-a-time
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "csv-ingestion-engine",
    cpus: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # small index probes push their band hashes down as an In
        # filter (up to ~300 values, see dedup_index._PUSHDOWN_MAX_HASHES);
        # the default threshold of 10 would degrade that to a useless
        # min/max range. Kept modest: parquet evaluates In as a
        # recursive predicate tree and thousands of values overflow
        # the executor stack.
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "400")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()

"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize_narrow(df: DataFrame) -> DataFrame:
    """Ensure compute-heavy narrow transforms downstream actually run in
    parallel: a small/single-file source yields 1-2 input partitions, so
    hashing/shingling/vector math would execute on one core. Repartition
    up to the cluster's default parallelism in that case; at real scale
    inputs already have many partitions and this is a no-op (no shuffle
    added)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df

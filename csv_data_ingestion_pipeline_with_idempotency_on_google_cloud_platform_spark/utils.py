"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize_narrow(df: DataFrame) -> DataFrame:
    """Ensure compute-heavy narrow transforms downstream actually run in
    parallel: a small/single-file source yields 1-2 input partitions, so
    hashing/shingling/vector math would execute on one core. Repartition
    up to the cluster's default parallelism in that case; at real scale
    inputs already have many partitions and this is a no-op (no shuffle
    added).

    The probe is FILE METADATA, never ``df.rdd``: with AQE enabled,
    accessing ``.rdd`` finalizes the physical plan and eagerly executes
    every shuffle stage under it — measured +2.5 s on semantic_dedup at
    sf0.1 (the round-5→6 drift tracker's one real regression). Plans
    with no file inputs (in-memory test frames, post-shuffle subtrees)
    are left alone — parallelize/exchange already spread those.

    The spread triggers only when BOTH the file count AND the
    byte-estimated split count are below half the cluster parallelism
    (r10, VERDICT r9 item 4): raw file count alone undercounts scan
    splits — a 500-file, multi-TB table on a 2000-core cluster splits
    into thousands of byte-range partitions at the scan, and the old
    file-count-only heuristic would have round-robined the whole table
    through a pointless extra shuffle. Catalyst's optimized-plan size
    estimate for a file scan is the sum of file sizes, so
    bytes / maxPartitionBytes bounds the scan's split count from below
    (conservatively: compression and the per-file open cost only
    increase the real split count). At bench scale a single small file
    estimates to 1 split and the spread fires exactly as before.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    threshold = max(2, target // 2)
    try:
        n_files = len(df.inputFiles())
    except Exception:  # no file-based leaves resolvable
        return df
    if not 0 < n_files < threshold:
        return df
    try:
        size_bytes = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        max_pb = int(
            spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
                spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
            )
        )
        est_splits = max(n_files, size_bytes // max(1, max_pb))
    except Exception:  # stats unavailable — fall back to file count
        est_splits = n_files
    if est_splits < threshold:
        return df.repartition(target)
    return df

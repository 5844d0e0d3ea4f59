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
    sf0.1 (the round-5→6 drift tracker's one real regression). A scan's
    file count bounds its split count from below, which is exactly the
    "would this serialize on one core" signal we need; plans with no
    file inputs (in-memory test frames, post-shuffle subtrees) are left
    alone — parallelize/exchange already spread those.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # no file-based leaves resolvable
        return df
    if 0 < n_files < max(2, target // 2):
        return df.repartition(target)
    return df

"""File-layout management for scan efficiency at scale.

Two writers that decide *where rows land on disk* so later scans read
less:

- `write_clustered`: range-cluster on a predicate column before the
  parquet write. `repartitionByRange` gives every output file a
  *disjoint* value range, and the within-file sort tightens every
  row-group's min/max stats, so a point or range predicate prunes to
  O(1) of the files at planning/scan time — the 100 TB answer to "the
  dashboard always filters on event date": without clustering a
  predicate touches every file, with it the scan cost is proportional
  to the selected range, not the table.
- `compact_files`: rewrite a directory of many small files into
  size-targeted ones. Streaming sinks (e.g. the ledger's micro-batch
  appends) accrete small files; at 1000 executors the per-file open
  overhead dominates a scan long before the bytes do.

Both are plain DataFrame writes — the exact parquet bytes, row-group
stats, and file boundaries come from Spark's native writer; nothing
here touches a row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str | Column],
    num_files: int | None = None,
) -> None:
    """Write `df` as parquet range-clustered on `cluster_cols`.

    The range shuffle samples the cluster column to build balanced
    range bounds (skew-tolerant: heavy values simply span several
    files), then each task sorts its slice so parquet row-group min/max
    stats are tight. Readers need no special API — Spark prunes via
    pushed filters + stats automatically.
    """
    part = (
        df.repartitionByRange(num_files, *cluster_cols)
        if num_files
        else df.repartitionByRange(*cluster_cols)
    )
    part.sortWithinPartitions(*cluster_cols).write.mode("overwrite").parquet(path)


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite `path` (parquet) into files of ~`target_file_mb`.

    Sizes the file count from the *input* bytes (cheap: file-status
    listing, no data read), coalesces — a narrow, shuffle-free merge of
    existing partitions — and atomically replaces via a temp directory
    rename. Returns the output file count."""
    import glob
    import os
    import shutil

    in_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    )
    n = max(1, round(in_bytes / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "__compact_tmp"
    spark.read.parquet(path).coalesce(n).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return len(glob.glob(os.path.join(path, "*.parquet")))

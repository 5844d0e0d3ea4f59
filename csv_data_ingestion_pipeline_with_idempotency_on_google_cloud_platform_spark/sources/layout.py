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


def zorder_key_col(
    cols: list[Column],
    mins: list[float],
    maxs: list[float],
    bits: int = 16,
) -> Column:
    """Morton (z-order) key: each column linearly scaled to a
    ``bits``-bit integer over [min, max], bits interleaved round-robin so
    nearby (x, y, ...) tuples get nearby keys along the space-filling
    curve. Pure JVM bit arithmetic — stays inside whole-stage codegen."""
    from pyspark.sql import functions as F

    n = len(cols)
    # Java long shifts mask the amount mod 64: interleaved bit positions
    # past 63 would silently alias onto low positions and corrupt the
    # curve, so shrink per-dimension resolution to fit one long.
    if bits * n > 63:
        bits = 63 // n
    top = (1 << bits) - 1
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        if lo is None or hi is None:
            # all-NULL cluster column: no locality to extract
            lo, hi = 0.0, 0.0
        span = (hi - lo) or 1.0
        q = F.floor((c.cast("double") - F.lit(lo)) / F.lit(span) * top).cast("long")
        # NULL values map to 0 explicitly — least/greatest SKIP nulls in
        # Spark, so without the coalesce a NULL would fall through to
        # `top` and co-cluster with the maximum-value rows
        q = F.coalesce(q, F.lit(0).cast("long"))
        scaled.append(F.greatest(F.lit(0), F.least(F.lit(top), q)))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int,
    bits: int = 16,
) -> None:
    """Write `df` parquet clustered on the z-order curve of several
    columns at once — the multi-predicate version of `write_clustered`.

    Range-clustering on one column makes *that* column's file stats
    tight and leaves every other column spanning the full value range
    in every file; z-ordering spends the locality budget across all
    `cluster_cols`, so with F files each file covers ~F^(-1/d) of each
    of the d dimensions — predicates on ANY clustered column prune most
    files via row-group min/max stats (this is what Delta/Iceberg
    OPTIMIZE ZORDER does; re-derived here from the public Morton-curve
    construction).

    Column min/max come from one tiny aggregate (2·d scalars on the
    driver — planning state, same standing as k-means centroids). The
    z-key shuffle is `repartitionByRange` — sampled balanced bounds,
    skew-tolerant — and files sort by z within, tightening row groups.
    """
    from pyspark.sql import functions as F

    aggs = []
    for c in cluster_cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    mins = [row[f"__min_{c}"] for c in cluster_cols]
    maxs = [row[f"__max_{c}"] for c in cluster_cols]
    z = zorder_key_col([F.col(c) for c in cluster_cols], mins, maxs, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite `path` (parquet) into files of ~`target_file_mb`.

    Sizes the file count from the *input* bytes (cheap: file-status
    listing, no data read), coalesces — a narrow, shuffle-free merge of
    existing partitions — and swaps directories with a
    crash-recoverable rename sequence: the original moves aside BEFORE
    it is deleted, so no failure window loses the dataset (a crash
    leaves either the original, or the replacement plus a stale
    `__compact_old` to sweep — never nothing). Returns the output file
    count.

    Local/POSIX-volume helper by design (glob/os/shutil): on an object
    store, compaction belongs to a table format (Delta/Iceberg
    OPTIMIZE) or a rewrite into a fresh prefix + pointer flip — renames
    are not atomic there either way.
    """
    import glob
    import os
    import shutil

    in_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    )
    n = max(1, round(in_bytes / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    spark.read.parquet(path).coalesce(n).write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)  # stale leftover from an interrupted run
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(glob.glob(os.path.join(path, "*.parquet")))

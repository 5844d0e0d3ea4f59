"""Training-shard export: the pipeline's last mile.

A trained-on corpus ships as shards: the corpus in a deterministic
global shuffle order, cut into ~equal files, with a manifest recording
what landed where. Requirements at 100 TB:

- **Deterministic shuffle.** Training order must be reproducible and
  uncorrelated with ingest order. `ORDER BY md5(key)` gives both — a
  cryptographic-hash sort is an unbiased permutation that any engine
  reproduces bit-for-bit (same property the sampling/split operators
  lean on). No RNG, no seed bookkeeping, no partition dependence.
- **No global sort bottleneck.** `repartitionByRange` on the hash
  samples range bounds and routes rows in one shuffle; each task sorts
  only its own shard (`sortWithinPartitions`). Spark never materializes
  a total order on one node.
- **A manifest you can trust.** Per-shard row counts and byte sizes
  come from the parquet FOOTERS of what was actually written — not
  from the plan — so the manifest catches a lost/truncated file. (Here
  the footers are read driver-side; at real scale the same read is a
  tiny Spark job over the file listing.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    key: str = "doc_id",
) -> None:
    """Write `df` as `num_shards` parquet shards in deterministic
    md5(key) shuffle order."""
    shuffled = (
        df.withColumn("__shuffle_key", F.md5(F.col(key).cast("string")))
        .repartitionByRange(num_shards, "__shuffle_key")
        .sortWithinPartitions("__shuffle_key")
        .drop("__shuffle_key")
    )
    shuffled.write.mode("overwrite").parquet(path)


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """(shard, n_rows, n_bytes) per written shard file, from parquet
    footer metadata only — no row data is read."""
    import glob
    import os

    import pyarrow.parquet as pq

    rows = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        rows.append((os.path.basename(f), md.num_rows, os.path.getsize(f)))
    return spark.createDataFrame(rows, "shard string, n_rows long, n_bytes long")

"""Sequence packing — assign documents to fixed-budget training packs.

LLM pretraining consumes fixed-length token windows; feeding one short
document per window wastes compute, so pipelines pack multiple
documents per window. Exact greedy bin-packing is inherently
sequential; the scalable, deterministic formulation used here is
*offset packing*: within each partition stream, order documents by a
stable key, take the exclusive running total of their cost, and assign
``pack_id = floor(offset / budget)``. Properties:

- deterministic and engine-independent (pure window expression — the
  oracle twin is the identical ANSI window function);
- each pack's total overshoots the budget by less than one document's
  cost (documents straddle pack boundaries exactly once), matching the
  "pack then split at window boundary" convention of training loaders;
- scale: the window is partitioned by a stream column (language,
  source shard, hash bucket — caller's choice), so no global sort:
  each partition packs independently and in parallel. At 100 TB, use a
  hash-bucket stream column with ~10k buckets: per-bucket sequential
  scan after one shuffle, identical plan shape to any windowed agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    cost_col: str,
    budget: int,
    stream_col: str,
    order_col: str = "doc_id",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Add ``pack_col``: the 0-based pack index within each
    ``stream_col`` group, packing by cumulative ``cost_col`` offset
    against ``budget``. Ordering within a stream follows ``order_col``
    (must be unique per stream for determinism)."""
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(cost_col).over(w), F.lit(0))
    return docs.withColumn(
        pack_col, F.floor(offset / F.lit(float(budget))).cast("long")
    )


def pack_stats(
    packed: DataFrame,
    cost_col: str,
    stream_col: str,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Per-pack utilization summary: document count, total cost."""
    return packed.groupBy(stream_col, pack_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(cost_col).alias("total_cost"),
    )

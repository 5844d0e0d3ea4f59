"""Streaming Count-Min maintenance — the sketch as a plain streaming
aggregation.

Count-Min's whole design point is mergeability: the d x w counter
table of a union of streams is the cell-wise sum of their tables. In
Spark that property collapses the "streaming sketch" to a built-in
windowless streaming aggregate — project each arriving row to its d
(j, bucket) cells (operators/sketches.py:countmin_cells, the SAME
projection the batch sketch uses, so the hash family cannot drift)
and let structured streaming's stateful groupBy keep the running
counts. No applyInPandasWithState is needed: state is exactly the
d x w cells (bounded, independent of key cardinality or stream
length), checkpointed and restart-safe like any streaming agg, and
the result after any prefix of the stream is bit-identical to the
batch sketch over the same prefix (pinned in
tests/test_sketch_stream.py).

This is the streaming twin of X49's `countmin_freq`: run the monitor
over the live feed, probe ad hoc by joining keys' cells against the
materialized counter table with the one-sided est >= exact guarantee
intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import countmin_cells


def streaming_countmin(
    stream: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Running d x w Count-Min counter table over a stream. Returns
    the aggregate (j, bucket, c) frame; write it with outputMode
    "complete" (the table is bounded at d*w rows) or "update" for
    changed cells only."""
    return (
        countmin_cells(stream, key_col, depth, width)
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )

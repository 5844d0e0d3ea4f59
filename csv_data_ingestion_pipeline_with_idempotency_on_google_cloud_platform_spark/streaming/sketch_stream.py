"""Streaming sketch maintenance — the X49 twins.

Mergeability is what makes a sketch streamable, and the two sketches
land on opposite sides of Spark's streaming API:

* Count-Min merges by CELL-WISE ADDITION, so its maintenance
  collapses to a built-in windowless streaming aggregate — project
  each row to its d (j, bucket) cells
  (operators/sketches.py:countmin_cells, the SAME projection the
  batch sketch uses, so the hash family cannot drift) and let the
  stateful groupBy keep running counts. No custom state handler:
  state is exactly the d x w cells, bounded regardless of key
  cardinality or stream length.
* KMV merges by UNION-THEN-RETAKE-k-SMALLEST — an order statistic,
  not an additive aggregate — so it carries its <= k-longs-per-group
  synopsis through `applyInPandasWithState`.

Both emit results bit-compatible with their batch forms over any
stream prefix and survive checkpoint restarts (pinned in
tests/test_sketch_stream.py). Production probes the materialized
tables: Count-Min with the one-sided est >= exact guarantee intact,
KMV with the (k-1)/R estimate plus downstream set algebra
(operators/sketches.py:kmv_set_ops).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketches import _KMV_DOMAIN, _hash60, countmin_cells

KMV_OUTPUT_DDL = "group STRING, k_used BIGINT, est_distinct DOUBLE"
KMV_STATE_DDL = "hs ARRAY<BIGINT>"


def streaming_kmv_distinct(
    stream: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 256,
) -> DataFrame:
    """Running per-group KMV distinct-count estimate over a stream —
    the twin of the batch `kmv_distinct`, maintained with
    `applyInPandasWithState` because the k-min synopsis (unlike
    Count-Min's cell counts) is not a built-in aggregate.

    The hash projection stays JVM-side (the same md5-60bit family as
    the batch sketch, shared via operators/sketches._hash60); Python
    only maintains the k smallest hashes per group — state is <= k
    longs regardless of stream length or key cardinality, and the
    k-min of a union is the k-min of (previous synopsis ∪ new batch),
    so emissions after any prefix match the batch sketch over that
    prefix (pinned in tests/test_sketch_stream.py, including across a
    checkpoint restart). Emits one (group, k_used, est_distinct) row
    per group per batch; below capacity the estimate IS the exact
    distinct count."""
    cells = stream.where(
        F.col(group_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("g"),
        _hash60(F.col(key_col)).alias("h"),
    )

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (g,) = key
        hs = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            # bulk set insert (r9): one C-level tolist instead of a
            # per-row Python int() round trip
            hs.update(pdf["h"].astype("int64").tolist())
        synopsis = sorted(hs)[:k]
        state.update((synopsis,))
        k_used = len(synopsis)
        if k_used < k:
            est = float(k_used)
        else:
            est = (k - 1) * _KMV_DOMAIN / float(synopsis[-1])
        yield pd.DataFrame(
            {
                "group": [g],
                "k_used": [k_used],
                "est_distinct": [est],
            }
        )

    return cells.groupBy("g").applyInPandasWithState(
        _fn,
        outputStructType=KMV_OUTPUT_DDL,
        stateStructType=KMV_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


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

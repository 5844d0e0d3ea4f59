"""Custom stateful streaming operator: cross-batch exact dedup via
`applyInPandasWithState` — the LLM-pipeline pattern of "emit each
document's content hash the first time it is ever seen".

Spark has no built-in streaming dedup-with-unbounded-custom-state
operator surface beyond `dropDuplicates` (which this generalizes — here
the state per key records first-seen doc id and a duplicate counter,
and the operator can be extended with TTLs or approximate state).

Scale notes: state is partitioned by the shuffle on `content_hash`, so
each task owns a disjoint hash range; state size is one small row per
distinct document. Arrow batches keep the Python hop vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.text import content_hash_col

OUTPUT_DDL = "content_hash STRING, first_doc_id BIGINT, n_duplicates BIGINT"
STATE_DDL = "first_doc_id BIGINT, n_seen BIGINT"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (content_hash,) = key
    first_doc_id, n_seen = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        # vectorized (r9): first arrival is row 0 of the first
        # non-empty chunk; the count is the chunk length
        if first_doc_id is None and len(pdf):
            first_doc_id = int(pdf["doc_id"].iloc[0])  # first arrival wins
        n_seen += len(pdf)
    state.update((first_doc_id, n_seen))
    yield pd.DataFrame(
        {
            "content_hash": [content_hash],
            "first_doc_id": [first_doc_id],
            "n_duplicates": [n_seen - 1],
        }
    )


def streaming_exact_dedup(docs_stream: DataFrame) -> DataFrame:
    """Stateful streaming dedup: one output row per content hash per
    batch it appears in, carrying the first-ever doc id and the running
    duplicate count. Input stream needs (doc_id, text)."""
    hashed = docs_stream.select(
        docs_stream["doc_id"], content_hash_col("text").alias("content_hash")
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Streaming SCD2: maintain type-2 validity intervals incrementally
via `applyInPandasWithState` — the streaming twin of
operators/cdc.py:scd2_build.

Per-key state holds the OPEN interval (current attribute, its
valid_from, the tiebreak id). Each micro-batch processes that key's
changes in (ts, tiebreak) order: a change to a NEW attribute closes
the open interval (emitting the finished row exactly as the batch
operator would) and opens the next one; a same-attribute change
extends silently (the batch operator's consecutive-duplicate
collapse). The open interval itself is re-emitted each batch it
changes (update mode) with valid_to NULL / is_current true, so a
downstream latest-wins sink converges to the batch result.

Equivalence contract (pinned in tests/test_scd2_stream.py): if events
arrive in event-time order across batches — the ledger convention;
out-of-order arrivals follow arrival order, exactly like the batch
operator run on the arrival-ordered log — the union of closed rows +
latest open rows equals scd2_build on the full log.

Scale: state is one small row per key, partitioned by the stream's
user_id shuffle; Arrow batches keep the Python hop vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = (
    "user_id BIGINT, event_type STRING, valid_from_us BIGINT, "
    "valid_to_us BIGINT, is_current BOOLEAN"
)
STATE_DDL = "cur_attr STRING, valid_from_us BIGINT, tb BIGINT"


def _scd2_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    cur_attr, valid_from_us, tb = state.get if state.exists else (None, None, None)
    rows = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch):
        batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
        changed = False
        for ts_us, event_id, attr in zip(
            batch["ts_us"], batch["event_id"], batch["event_type"]
        ):
            if cur_attr is None:
                cur_attr, valid_from_us, tb = attr, int(ts_us), int(event_id)
                changed = True
            elif attr != cur_attr:
                rows.append(
                    (int(user_id), cur_attr, int(valid_from_us), int(ts_us), False)
                )
                cur_attr, valid_from_us, tb = attr, int(ts_us), int(event_id)
                changed = True
        state.update((cur_attr, int(valid_from_us), int(tb)))
        if changed or rows:
            rows.append((int(user_id), cur_attr, int(valid_from_us), None, True))
    if rows:
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id",
                "event_type",
                "valid_from_us",
                "valid_to_us",
                "is_current",
            ],
        )


def streaming_scd2(changes_stream: DataFrame) -> DataFrame:
    """Stateful streaming SCD2 over (event_id, ts, user_id,
    event_type). Emits closed intervals as they finish plus the
    current open interval per touched key each batch (update mode);
    timestamps ride as epoch micros (the state schema is flat
    columns)."""
    from pyspark.sql import functions as F

    prepped = changes_stream.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _scd2_fn,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

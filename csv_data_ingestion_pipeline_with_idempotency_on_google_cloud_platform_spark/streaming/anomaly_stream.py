"""Streaming drift monitor: cross-batch CUSUM control chart via
`applyInPandasWithState` — the streaming twin of the batch
operators/temporal.py:cusum_drift / rolling_zscore family.

The target level is trained OFFLINE (a per-group mean from a
reference window, same handoff shape as quality_stream's classifier
weights: plain driver values, re-entering the stream as milli-int
literals). The stream then maintains, per group, the running
cumulative deviation Σ(value − target) and its high-water mark —
"did this feed's level shift, and how far has it run" — emitting one
update row per group per micro-batch.

Determinism/scale notes: state is three integers per group (count,
cusum in milli-units, max |cusum| in milli-units) — integer
arithmetic end to end, so emissions are reproducible regardless of
batch slicing within a group. Group state is partitioned by the
shuffle on the group key; a monster group's values still stream
through Arrow batches without materializing. The within-batch
accumulation order follows event ids so the high-water mark is
well-defined under re-slicing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = (
    "group STRING, n_seen BIGINT, cusum_milli BIGINT, "
    "max_abs_cusum_milli BIGINT, alarm BOOLEAN"
)
STATE_DDL = "n_seen BIGINT, cusum_milli BIGINT, max_abs_milli BIGINT"


def train_targets(events: DataFrame, group_col: str = "event_type",
                  value_col: str = "value") -> dict[str, int]:
    """Offline reference levels: per-group mean value in milli-units
    (floored — exact DECIMAL sums, integer division). Driver state is
    one int per group — the same bounded class as classifier weights."""
    from pyspark.sql import functions as F

    rows = (
        events.groupBy(F.col(group_col).alias("g"))
        .agg(
            F.floor(
                (F.sum(F.col(value_col).cast("decimal(18,6)")) * 1000)
                / F.count(F.lit(1))
            ).cast("long").alias("target_milli")
        )
        .collect()
    )
    return {r["g"]: int(r["target_milli"]) for r in rows}


def streaming_cusum_monitor(
    events_stream: DataFrame,
    targets_milli: dict[str, int],
    alarm_milli: int,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group streaming CUSUM against a fixed trained target: one
    update row per group per batch with the running deviation and its
    high-water mark; `alarm` fires once max |cusum| crosses
    ``alarm_milli``. Unknown groups (no trained target) are skipped —
    an untrained feed has no level to drift from."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (group,) = key
        target = targets_milli.get(group)
        if target is None:
            return
        n_seen, cusum, max_abs = (
            state.get if state.exists else (0, 0, 0)
        )
        # concatenate ALL Arrow chunks before ordering (the r8 SPRT
        # advice fix applied here too: a group's micro-batch arrives as
        # multiple ~10k-row chunks with no cross-chunk order guarantee,
        # and the high-water mark is order-sensitive), then the walk
        # vectorizes: np.round is half-to-even exactly like Python
        # round(), so the int64 cumsum path is bit-identical to the
        # scalar loop (r9, guide §4.2)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(id_col)
            q = (
                (pdf[value_col].astype("float64") * 1000.0)
                .round()
                .astype("int64")
                - target
            )
            path = q.cumsum() + cusum
            max_abs = max(max_abs, int(path.abs().max()))
            cusum = int(path.iloc[-1])
            n_seen += len(pdf)
        state.update((n_seen, cusum, max_abs))
        yield pd.DataFrame(
            {
                "group": [group],
                "n_seen": [n_seen],
                "cusum_milli": [cusum],
                "max_abs_cusum_milli": [max_abs],
                "alarm": [max_abs > alarm_milli],
            }
        )

    return events_stream.select(
        events_stream[group_col], events_stream[value_col], events_stream[id_col]
    ).groupBy(group_col).applyInPandasWithState(
        _fn,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

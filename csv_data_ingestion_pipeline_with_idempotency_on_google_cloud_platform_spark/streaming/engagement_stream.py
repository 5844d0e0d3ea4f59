"""Streaming engagement twin of batch X87 `active_user_rollup`
(operators/windows.py): a per-USER stateful sliding day-set dedup via
`applyInPandasWithState` that emits each (user, day) the FIRST time it
is seen — the delta ledger whose distinct() fed through
`rollup_user_days` reproduces the batch DAU/WAU/MAU exactly.

Why this decomposition (and not a per-day distinct count in state):
the batch operator's insight is that everything is user-day-sized;
the streaming form keeps that. State is keyed by user — each user
holds a BOUNDED sorted day list (only days within ``retention_days``
of that user's max day; default = the MAU window, the oldest day any
report can still need). Emissions are new-user-day DELTAS, so the
downstream ledger is append-only (the ingest_stream discipline) and
the readout is a plain batch aggregate over it — no unbounded
distinct-count state, no per-day user sets.

Late-data contract: a user-day arriving more than ``retention_days``
behind that user's newest day has aged out of state and re-emits; the
readout's distinct() absorbs the duplicate, so results stay EXACT —
the horizon bounds state size, not correctness. (This is the same
append+dedup-at-read pattern the ledger uses for idempotency,
reference semantics main.py:15-18.)

Determinism: emissions per user are set-differences of integer day
sets — independent of batch slicing and within-batch order; the
checkpoint-restart test pins that a replayed batch emits nothing new.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.windows import rollup_user_days

OUTPUT_DDL = "user_id BIGINT, d BIGINT"
STATE_DDL = "days ARRAY<BIGINT>"


def streaming_user_days(
    events_stream: DataFrame,
    retention_days: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Append-mode stream of first-seen (user_id, d) user-days.

    Input stream needs (user_col, ts_col); day is the UTC date as
    days-since-epoch (the batch operator's integer grid)."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        (days,) = state.get if state.exists else ([],)
        seen = set(int(x) for x in days)
        fresh: set[int] = set()
        for pdf in pdfs:
            # dedup at C level first (r9): a user-day repeats many
            # times per batch; unique() collapses it before Python sees
            # a value
            for d in pdf["d"].unique().tolist():
                d = int(d)
                if d not in seen:
                    fresh.add(d)
        if fresh:
            keep = seen | fresh
            horizon = max(keep) - retention_days + 1
            state.update((sorted(x for x in keep if x >= horizon),))
            yield pd.DataFrame(
                {"user_id": [user] * len(fresh), "d": sorted(fresh)}
            )

    base = events_stream.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).cast("long").alias("user_id"),
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).cast("long").alias("d"),
    )
    return base.groupBy("user_id").applyInPandasWithState(
        _fn,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def engagement_rollup_from_ledger(
    user_days: DataFrame, wau_days: int = 7, mau_days: int = 30
) -> DataFrame:
    """Batch readout over the emitted delta ledger: distinct() absorbs
    any beyond-horizon re-emissions, then the SAME rollup core as the
    batch operator produces (day, dau, wau, mau) — bit-identical to
    running batch `active_user_rollup` over the raw events."""
    ud = user_days.select(F.col("d"), F.col("user_id").alias("u")).distinct()
    return rollup_user_days(ud, wau_days=wau_days, mau_days=mau_days)

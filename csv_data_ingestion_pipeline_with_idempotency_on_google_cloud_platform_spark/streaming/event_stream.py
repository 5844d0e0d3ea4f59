"""Streaming event-time analytics — extension X6, streaming side.

The batch windowed aggregations in operators/windows.py reuse the exact
same `F.window` expressions here; the only streaming additions are the
watermark (bounded state, late-data tolerance) and the output mode.

At scale: state store size is bounded by (watermark horizon ×
active keys); the shuffle key is (window, event_type) so state lookups
are co-located with the aggregation tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type.

    Events later than `watermark` behind the max seen event time are
    dropped and their windows finalized — the streaming twin of
    operators.windows.tumbling_window_agg.
    """
    # watermarks require zoned TIMESTAMP event time; batch tables carry
    # naive (NTZ) timestamps, so cast at the streaming boundary (session
    # timezone pins the interpretation)
    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_events_within_watermark(
    events_stream: DataFrame,
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """At-least-once → effectively-once for an event stream with the
    BUILT-IN bounded-state dedup: emit each key's first arrival and
    drop re-deliveries that land within the watermark horizon.

    Contrast with stateful_dedup (applyInPandasWithState, unbounded
    custom state): here Spark owns the state schema AND its eviction —
    a key older than the watermark is forgotten, so state is bounded by
    (arrival rate × horizon) regardless of stream lifetime. That is the
    right trade for transport-level duplicates (retries arrive within
    minutes), while content-level dedup wants the unbounded custom
    state. Output rows are the surviving events, unchanged.
    """
    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def interval_join_attribution(
    clicks_stream: DataFrame,
    purchases_stream: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every
    click by the same user within `horizon` before it.

    Both sides carry a watermark, so the join state each side buffers is
    bounded: a click can be dropped from state once the purchase-side
    watermark passes (click_ts + horizon), a purchase once it has seen
    all clicks at or before its timestamp. Without the time-range bound
    the state store would grow forever — the range condition is what
    makes stream-stream joins feasible at scale, and Spark derives the
    state eviction policy from it automatically.

    The batch twin (same predicate, same output) is
    operators.temporal.interval_join_batch; parity is pinned in
    tests/test_event_stream.py.
    """
    c = clicks_stream.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").cast("timestamp").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases_stream.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").cast("timestamp").alias("purchase_ts"),
        "value",
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        F.expr(
            f"""
            user_id = c_user_id
            AND click_ts <= purchase_ts
            AND click_ts >= purchase_ts - INTERVAL {horizon}
            """
        ),
        "inner",
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts", "value")


def sessionized_event_counts(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked per-user session windows — the streaming twin of
    operators.windows.session_window_agg. Session state merges as
    events arrive (windows grow/merge until the watermark closes them);
    state size is bounded by (watermark horizon × active users)."""
    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# row-level behavioral twins: sessionize / funnel progress
# --------------------------------------------------------------------------
#
# Both are sequential-pattern operators: their batch formulations
# (operators/windows.py:sessionize, funnel_counts) fold per-user event
# history left-to-right in timestamp order. The streaming twins keep
# that fold's CURSOR as keyed state (applyInPandasWithState) instead of
# re-reading history — per-user state is a handful of longs, not the
# event list, so state size is O(active users), independent of stream
# lifetime. Contract: events must arrive in per-user timestamp order
# across micro-batches (in-batch disorder is sorted away); that is the
# same in-order contract a log-compacted event bus provides per key.

_SESSIONIZE_OUT_DDL = (
    "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, "
    "session_idx BIGINT, session_start TIMESTAMP"
)
_SESSIONIZE_STATE_DDL = (
    "last_ts_us BIGINT, session_idx BIGINT, session_start_us BIGINT"
)


def streaming_sessionize(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of operators.windows.sessionize: assign each
    event its per-user session index as it arrives — a new session
    starts when the gap to the user's previous event exceeds
    `gap_minutes`.

    State per user: (last event time, running session index, current
    session start) — three longs. Idle users are evicted by event-time
    timeout once the watermark passes (last event + gap): at that point
    the session can never be extended, so the only information lost is
    the running index base; a user who reappears after eviction
    restarts at session_idx 0. Downstream consumers that need an
    eviction-stable session key should use (user_id, session_start) —
    it identifies a session regardless of index restarts. Batch parity
    (no evictions in-horizon) is pinned in tests/test_event_stream.py.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_ts + gap: session can never extend
            state.remove()
            return
        (user_id,) = key
        last_us, idx, start_us = (
            state.get if state.exists else (None, -1, None)
        )
        out_event_id, out_ts, out_idx, out_start = [], [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            ts_us = pdf["ts"].astype("int64") // 1000
            for eid, t, us in zip(pdf["event_id"], pdf["ts"], ts_us):
                us = int(us)
                if last_us is None or us - last_us > gap_us:
                    idx += 1
                    start_us = us
                last_us = us
                out_event_id.append(int(eid))
                out_ts.append(t)
                out_idx.append(idx)
                out_start.append(start_us)
        if last_us is not None:
            state.update((last_us, idx, start_us))
            # after a checkpoint restart the recovered watermark may
            # already be past (last + gap) for long-idle users; a
            # timeout in the past is invalid, so clamp one ms ahead —
            # the eviction then fires on the next trigger
            timeout_ms = last_us // 1000 + gap_us // 1000
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(timeout_ms, wm + 1))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": out_event_id,
                "ts": out_ts,
                "session_idx": out_idx,
                "session_start": pd.to_datetime(out_start, unit="us"),
            }
        )

    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.select("user_id", "event_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_SESSIONIZE_OUT_DDL,
            stateStructType=_SESSIONIZE_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_funnel_progress(
    events_stream: DataFrame,
    steps: list[str],
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of operators.windows.funnel_counts, emitted as
    per-user PROGRESS updates: (user_id, max_step) whenever a user
    advances to a further funnel step (1-based; ordered semantics —
    each step's event at-or-after the time the previous step was
    reached). funnel_counts' per-step totals are a trivial rollup of
    the latest row per user: n_users(step i) = #users with
    max_step >= i — kept OUTSIDE the stream so the stateful operator
    stays single (chaining arbitrary state + agg is where streaming
    semantics get murky; the sink-side rollup is exact).

    State per user: one resolved-time cursor per step (|steps| longs).
    A user who completes the funnel is evicted immediately — progress
    can never advance further, so completed users cost nothing. The
    in-order contract matches streaming_sessionize; within a batch,
    ties at the same timestamp resolve earlier-step-first, matching
    the batch fold's >= semantics.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    n_steps = len(steps)
    step_of = {s: i for i, s in enumerate(steps)}
    out_ddl = "user_id BIGINT, max_step BIGINT"
    state_ddl = ", ".join(f"t{i} BIGINT" for i in range(n_steps))

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        times = list(state.get) if state.exists else [None] * n_steps
        before = sum(t is not None for t in times)
        for pdf in pdfs:
            pdf = pdf.assign(__step=pdf["event_type"].map(step_of))
            pdf = pdf.sort_values(["ts", "__step"])
            ts_us = pdf["ts"].astype("int64") // 1000
            for si, us in zip(pdf["__step"], ts_us):
                si, us = int(si), int(us)
                if times[si] is not None:
                    continue
                if si == 0 or (
                    times[si - 1] is not None and us >= times[si - 1]
                ):
                    times[si] = us
        reached = sum(t is not None for t in times)
        if reached > before:
            yield pd.DataFrame({"user_id": [user_id], "max_step": [reached]})
        if reached == n_steps:
            state.remove()  # funnel complete: no further progress possible
        else:
            state.update(tuple(times))

    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.filter(F.col("event_type").isin(steps))
        .select("user_id", "event_type", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_ddl,
            stateStructType=state_ddl,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_cohort_updates(
    events_stream: DataFrame,
    bucket_days: int = 7,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of operators.windows.cohort_retention, emitted as
    incremental CELL updates: one (cohort_start, period_offset,
    user_id) row the first time a user is active in a period. The
    retention matrix is a sink-side rollup — count distinct user_id
    per (cohort_start, period_offset) — exactly the batch result,
    while the stream stays a single stateful operator.

    State per user: the first-activity bucket (one long — the cohort
    assignment, fixed at first sight under the in-order contract) plus
    the set of periods already emitted (longs, bounded by stream
    lifetime in buckets — weeks, not events). No eviction: a cohort
    user can return after any idle gap and must not be re-emitted as
    new; at 100 TB the emitted-offsets set would move to a TTL'd or
    bitmap form, same state key.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    day_us = 86_400_000_000
    out_ddl = "cohort_start DATE, period_offset BIGINT, user_id BIGINT"
    state_ddl = "first_bucket BIGINT, emitted ARRAY<BIGINT>"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import datetime

        (user_id,) = key
        first_bucket, emitted = (
            state.get if state.exists else (None, [])
        )
        emitted = set(emitted or [])
        new_cells = []
        for pdf in pdfs:
            buckets = (
                (pdf["ts"].astype("int64") // 1000 // day_us) // bucket_days
            )
            for b in sorted(int(x) for x in buckets):
                if first_bucket is None:
                    first_bucket = b
                off = b - first_bucket
                if off not in emitted:
                    emitted.add(off)
                    new_cells.append(off)
        state.update((first_bucket, sorted(emitted)))
        if new_cells:
            cohort = datetime.date(1970, 1, 1) + datetime.timedelta(
                days=int(first_bucket) * bucket_days
            )
            yield pd.DataFrame(
                {
                    "cohort_start": [cohort] * len(new_cells),
                    "period_offset": new_cells,
                    "user_id": [user_id] * len(new_cells),
                }
            )

    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_ddl,
            stateStructType=state_ddl,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_rolling_user_stats(
    events_stream: DataFrame,
    trailing_rows: int = 3,
    trailing_micros: int = 3_600_000_000,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of operators.windows.rolling_user_stats — the
    online feature-store shape: every event is emitted WITH its
    trailing features (last-`trailing_rows` prior events, leakage-free;
    trailing time horizon inclusive) the moment it arrives.

    State per user: a deque of (ts, value) pairs covering
    max(trailing_rows, events inside trailing_micros) — entries older
    than both bounds are pruned on every batch, so state is
    (event rate × horizon), never the history. Same in-order contract
    as the other row-level twins.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_ddl = (
        "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, "
        "prev_n BIGINT, prev_sum DOUBLE, hour_n BIGINT, hour_sum DOUBLE"
    )
    state_ddl = "ts_us ARRAY<BIGINT>, vals ARRAY<DOUBLE>"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_hist, val_hist = (
            ([int(t) for t in state.get[0]], [float(v) for v in state.get[1]])
            if state.exists
            else ([], [])
        )
        rows = {
            "user_id": [], "event_id": [], "ts": [],
            "prev_n": [], "prev_sum": [], "hour_n": [], "hour_sum": [],
        }
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = pdf["ts"].astype("int64") // 1000
            for eid, t, us, v in zip(
                pdf["event_id"], pdf["ts"], ts_us, pdf["value"]
            ):
                us, v = int(us), float(v)
                prev = list(zip(ts_hist[-trailing_rows:], val_hist[-trailing_rows:]))
                in_hour = [
                    (pt, pv)
                    for pt, pv in zip(ts_hist, val_hist)
                    if us - trailing_micros <= pt
                ]
                rows["user_id"].append(user_id)
                rows["event_id"].append(int(eid))
                rows["ts"].append(t)
                rows["prev_n"].append(len(prev))
                rows["prev_sum"].append(float(sum(pv for _, pv in prev)))
                # the batch operator's RANGE frame includes the current row
                rows["hour_n"].append(len(in_hour) + 1)
                rows["hour_sum"].append(float(sum(pv for _, pv in in_hour)) + v)
                ts_hist.append(us)
                val_hist.append(v)
                # prune: keep what either frame could still need
                cutoff = us - trailing_micros
                while (
                    len(ts_hist) > trailing_rows and ts_hist[0] < cutoff
                ):
                    ts_hist.pop(0)
                    val_hist.pop(0)
        state.update((ts_hist, val_hist))
        yield pd.DataFrame(rows)

    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.select("user_id", "event_id", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_ddl,
            stateStructType=state_ddl,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_reach(
    events_stream: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window distinct reach — the streaming twin
    of operators.windows.window_distinct_users (n_users half; the raw
    n_events half is windowed_event_counts).

    Exact count_distinct is not a streaming aggregate, so reach is the
    standard two-stateful-operator chain: dropDuplicates keyed on
    (user, window) collapses each user's window presence to one row,
    then the windowed count aggregates survivors. Both operators share
    the watermark, so dedup state is evicted once a window's horizon
    passes — state is bounded by (active windows × users active in
    them), the exact-reach floor.
    """
    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        # NULL users are excluded up front: batch count_distinct skips
        # NULL, but dropDuplicates would keep one NULL row per window
        # and the count would tally it — an off-by-one vs the batch twin
        events_stream.filter(F.col("user_id").isNotNull())
        .withWatermark("ts", watermark)
        .select("ts", "user_id", F.window("ts", duration).alias("w"))
        .dropDuplicates(["user_id", "w"])
        .groupBy("w")
        .agg(F.count("*").alias("n_users"))
        .select(F.col("w.start").alias("window_start"), "n_users")
    )


def streaming_event_transitions(
    events_stream: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of operators.windows.event_transitions, emitted
    as per-batch transition INCREMENTS: (prev_type, next_type, n) rows
    whose sink-side sum equals the batch matrix's counts (the
    probability normalization is a trivial rollup over the summed
    matrix, kept outside the stream like funnel_counts' totals).

    State per user: the last event's (micros, event_id, type) — three
    scalars, so state is bounded by |active users| regardless of
    stream length. Same in-order-per-key delivery contract as
    streaming_sessionize; within a batch, (ts, event_id) ordering
    reproduces the batch LAG exactly.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_ddl = "prev_type STRING, next_type STRING, n BIGINT"
    state_ddl = "last_us BIGINT, last_eid BIGINT, last_type STRING"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_type = state.get[2] if state.exists else None
        last_us = state.get[0] if state.exists else None
        last_eid = state.get[1] if state.exists else None
        # chunks of one group can arrive in any order within the batch:
        # concatenate before sorting (per-user groups are small)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"])
            counts: dict[tuple, int] = {}
            us = pdf["ts"].astype("int64") // 1000
            for cur_us, eid, cur in zip(
                us, pdf["event_id"], pdf["event_type"]
            ):
                if last_type is not None:
                    k = (last_type, cur)
                    counts[k] = counts.get(k, 0) + 1
                last_type, last_us, last_eid = cur, int(cur_us), int(eid)
            state.update((last_us, last_eid, last_type))
            if counts:
                keys = sorted(counts)
                yield pd.DataFrame(
                    {
                        "prev_type": [k[0] for k in keys],
                        "next_type": [k[1] for k in keys],
                        "n": [counts[k] for k in keys],
                    }
                )

    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.select("user_id", "event_id", "event_type", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_ddl,
            stateStructType=state_ddl,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_rollup_updates(
    changes_stream: DataFrame,
    key: str,
    group_col: str,
    sum_col: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of operators.cdc.maintain_rollup: turn a CDC
    change stream into per-batch rollup DELTAS (group_value, d_n,
    d_sum) whose sink-side sum over any prefix of batches IS the
    rollup of the post-image table at that point — a continuously
    maintained materialized view without ever rescanning a base table.

    The batch form reads pre-images from the snapshot; a stream cannot,
    so each key's current (group, value) lives in keyed state — one
    row per live key, the same cardinality the post-image table has,
    and the floor for exact maintenance (drop a key's state and its
    next change cannot be debited). Bootstrap: feed the initial
    snapshot through as a first batch of upserts against an empty
    rollup. A delete removes the key's state entirely, so a
    delete-then-reinsert key costs nothing between. Sums ride as
    micros-style scaled longs (decimal(18,6) semantics) to keep the
    emitted deltas exact across engines — values carrying more than
    6 dp round half-to-even here vs the batch form's DECIMAL half-up,
    a sub-micro divergence only on exact .5e-6 boundaries; the
    in-order-per-key contract matches the other row-level twins.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_ddl = f"{group_col} STRING, d_n BIGINT, d_sum_micro BIGINT"
    state_ddl = "grp STRING, val_micro BIGINT"

    def fn(
        key_t: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cur = tuple(state.get) if state.exists else None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values(["ts"])
        deltas: dict[str, list[int]] = {}

        def add(grp: str, dn: int, dv: int) -> None:
            d = deltas.setdefault(grp, [0, 0])
            d[0] += dn
            d[1] += dv

        for op, grp, val in zip(pdf["op"], pdf[group_col], pdf[sum_col]):
            micro = 0 if pd.isna(val) else round(float(val) * 1_000_000)
            if cur is not None:
                add(cur[0], -1, -cur[1])
            if op == "delete":
                cur = None
            else:
                cur = (grp, micro)
                add(grp, 1, micro)
        if cur is None:
            state.remove()
        else:
            state.update(cur)
        emit = {g: d for g, d in deltas.items() if d != [0, 0]}
        if emit:
            gs = sorted(emit)
            yield pd.DataFrame(
                {
                    group_col: gs,
                    "d_n": [emit[g][0] for g in gs],
                    "d_sum_micro": [emit[g][1] for g in gs],
                }
            )

    if dict(changes_stream.dtypes).get("ts") == "timestamp_ntz":
        changes_stream = changes_stream.withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
    return (
        changes_stream.select(key, group_col, sum_col, "op", "ts")
        .withWatermark("ts", watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_ddl,
            stateStructType=state_ddl,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_psi_drift(
    events_stream: DataFrame,
    base_counts: list[int],
    col: str = "value",
    lo: float = 0.0,
    hi: float = 500.0,
    duration: str = "6 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window PSI drift against a static baseline histogram — the
    streaming twin of operators.profiling.psi_drift, continuously
    answering "is the live feature distribution still the one we
    trained on?".

    ``base_counts`` is the precomputed baseline histogram
    (profiling.histogram_counts on the reference slice — n_bins ints
    of driver state, broadcast as literals). The per-window histogram
    is ONE stateful aggregation: the bin dimension is folded into
    n_bins conditional-count columns (streaming pivot is unsupported,
    and a (window, bin) grouping would need a second stateful
    aggregation for the window total), so state is |open windows| rows
    × (n_bins+1) longs. PSI per bin is then a stateless projection
    melted back to rows with stack().

    Emits (window_start, bin, bin_lo, base_count, cur_count,
    psi_contrib) once the watermark closes each window (append mode);
    Σ psi_contrib per window is that window's PSI. Same clamped
    binning and Laplace smoothing as the batch operator.
    """
    n_bins = len(base_counts)
    width = (hi - lo) / n_bins
    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    b = F.least(
        F.greatest(F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    aggs = [
        F.sum((F.col("__bin") == i).cast("long")).alias(f"__c{i}")
        for i in range(n_bins)
    ] + [F.count(F.lit(1)).alias("__total")]
    wide = (
        events_stream.withWatermark("ts", watermark)
        .select("ts", b.alias("__bin"))
        .groupBy(F.window("ts", duration).alias("w"))
        .agg(*aggs)
    )
    total_base = sum(base_counts)
    denom_b = float(total_base) + 0.5 * n_bins
    cols = []
    for i in range(n_bins):
        pb = (base_counts[i] + 0.5) / denom_b
        pc = (F.col(f"__c{i}") + 0.5) / (F.col("__total") + 0.5 * n_bins)
        cols.append(
            F.struct(
                F.lit(i).alias("bin"),
                F.round(F.lit(lo + i * width), 6).alias("bin_lo"),
                F.lit(base_counts[i]).cast("long").alias("base_count"),
                F.col(f"__c{i}").alias("cur_count"),
                F.round((pc - F.lit(pb)) * F.log(pc / F.lit(pb)), 6).alias(
                    "psi_contrib"
                ),
            )
        )
    return wide.select(
        F.col("w.start").alias("window_start"),
        F.explode(F.array(*cols)).alias("r"),
    ).select(
        "window_start", "r.bin", "r.bin_lo", "r.base_count", "r.cur_count",
        "r.psi_contrib",
    )

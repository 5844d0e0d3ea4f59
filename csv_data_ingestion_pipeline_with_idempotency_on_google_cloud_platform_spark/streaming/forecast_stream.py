"""Streaming twins of the forecasting/changepoint family
(operators/temporal.py:holt_winters_forecast / changepoint_detect) via
`applyInPandasWithState` — the same stateful-monitor pattern as the
CUSUM twin (anomaly_stream.py).

Input contract (both monitors): a stream of CLOSED daily totals
(group, day 'yyyy-MM-dd', y) — the shape a watermarked daily window
aggregate emits in append mode, i.e. the streaming equivalent of the
batch `_daily_units` frame. Rows within a micro-batch are processed in
day order.

- `streaming_holt_monitor` keeps the batch recurrence's CONSTANT
  per-group state (n_days, y1, level, trend — four BIGINTs): the Holt
  fold is order-defined, so days arriving at or before the last folded
  day are skipped (a closed-day feed is monotone; replays change
  nothing). Integer milli arithmetic with truncate-toward-zero
  division replicates the batch fold bit-for-bit, so after the same
  days the emitted (level, trend) equal the batch operator's and the
  h-step forecast is level + h·trend.

- `streaming_changepoint_monitor` keeps the group's daily series
  (days, ys arrays — bounded by days-per-group, the same bound the
  batch windows carry; `max_days` rings out the oldest beyond a cap)
  because the best-split argmin needs every prefix, not just the last
  one. Duplicate day rows are SUMMED into the day (the batch groupBy
  semantics); out-of-order days are fine. Each batch recomputes the
  closed-form split from exact integer prefix sums — identical scalar
  double algebra to the batch operator, so emissions match it on the
  same data.

Determinism/scale: all cross-batch state is integers; a group's state
is O(1) (Holt) or O(days) (changepoint) — never O(events). The
statistic recompute is O(days) python per group per batch, bounded by
the same days-per-group cap as the batch plan's window width.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOLT_OUTPUT_DDL = (
    "group STRING, n_days BIGINT, level_milli BIGINT, trend_milli BIGINT, "
    "forecast_next_milli BIGINT"
)
HOLT_STATE_DDL = "n_days BIGINT, y1 BIGINT, l BIGINT, b BIGINT, last_day STRING"

CHANGEPOINT_OUTPUT_DDL = (
    "group STRING, n_days BIGINT, split_day STRING, sse_reduction_milli DOUBLE"
)
CHANGEPOINT_STATE_DDL = "days ARRAY<STRING>, ys ARRAY<BIGINT>"


def _tdiv(x: int, y: int) -> int:
    """Truncate-toward-zero integer division — Spark's `div` (python's
    // floors, which differs on negative trends)."""
    q = abs(x) // y
    return q if (x >= 0) == (y >= 0) else -q


def streaming_holt_monitor(
    daily_stream: DataFrame,
    alpha_milli: int = 500,
    beta_milli: int = 300,
    group_col: str = "group",
    day_col: str = "day",
    y_col: str = "y",
) -> DataFrame:
    """Per-group streaming Holt level+trend: one update row per group
    per batch with the current (level, trend) in milli-units and the
    one-day-ahead forecast. State and arithmetic replicate the batch
    fold exactly (L_1 = 1000·y_1; B_1 = 1000·(y_2−y_1); then
    L = (α·1000·y + (1000−α)(L+B)) div 1000,
    B = (β·(L−L_prev) + (1000−β)·B) div 1000)."""
    a, bcoef, m = int(alpha_milli), int(beta_milli), 1000

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (group,) = key
        n, y1, l, b, last_day = (
            state.get if state.exists else (0, 0, 0, 0, "")
        )
        for pdf in pdfs:
            pdf = pdf.sort_values(day_col)
            for day, y in zip(pdf[day_col], pdf[y_col]):
                if day <= last_day:
                    continue  # closed-day feed is monotone; skip replays
                y = int(y)
                if n == 0:
                    y1 = y
                elif n == 1:
                    l = m * y1
                    b = m * (y - y1)
                else:
                    l_new = _tdiv(a * m * y + (m - a) * (l + b), m)
                    b = _tdiv(bcoef * (l_new - l) + (m - bcoef) * b, m)
                    l = l_new
                n += 1
                last_day = day
        state.update((n, y1, l, b, last_day))
        yield pd.DataFrame(
            {
                "group": [group],
                "n_days": [n],
                "level_milli": [l],
                "trend_milli": [b],
                "forecast_next_milli": [l + b],
            }
        )

    return (
        daily_stream.select(
            daily_stream[group_col], daily_stream[day_col], daily_stream[y_col]
        )
        .groupBy(group_col)
        .applyInPandasWithState(
            _fn,
            outputStructType=HOLT_OUTPUT_DDL,
            stateStructType=HOLT_STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_changepoint_monitor(
    daily_stream: DataFrame,
    group_col: str = "group",
    day_col: str = "day",
    y_col: str = "y",
    max_days: int = 1000,
) -> DataFrame:
    """Per-group streaming single-changepoint localization: one update
    row per group per batch naming the current best split day and the
    variance fraction it explains (1000·(1 − best_cost/total_sse)),
    recomputed from the group's exact integer daily series — the
    closed-form algebra of the batch operator. Groups need ≥2 days and
    positive total SSE to emit a split."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (group,) = key
        days, ys = (state.get if state.exists else ([], []))
        series = dict(zip(list(days), [int(y) for y in ys]))
        for pdf in pdfs:
            for day, y in zip(pdf[day_col], pdf[y_col]):
                series[day] = series.get(day, 0) + int(y)
        items = sorted(series.items())[-max_days:]
        state.update(([d for d, _ in items], [y for _, y in items]))
        n = len(items)
        if n < 2:
            return
        svals = [y for _, y in items]
        s_tot = sum(svals)
        ssq_tot = sum(y * y for y in svals)
        total_sse = float(ssq_tot) - float(s_tot) * float(s_tot) / n
        if total_sse <= 0:
            return
        best_cost, best_day = None, None
        sk, ssqk = 0, 0
        for t in range(1, n):  # split after day t (left = first t days)
            sk += svals[t - 1]
            ssqk += svals[t - 1] * svals[t - 1]
            left = float(ssqk) - float(sk) * float(sk) / t
            rk = s_tot - sk
            right = float(ssq_tot - ssqk) - float(rk) * float(rk) / (n - t)
            cost = left + right
            if best_cost is None or cost < best_cost:
                best_cost, best_day = cost, items[t - 1][0]
        yield pd.DataFrame(
            {
                "group": [group],
                "n_days": [n],
                "split_day": [best_day],
                "sse_reduction_milli": [
                    round(1000.0 * (1.0 - best_cost / total_sse), 3)
                ],
            }
        )

    return (
        daily_stream.select(
            daily_stream[group_col], daily_stream[day_col], daily_stream[y_col]
        )
        .groupBy(group_col)
        .applyInPandasWithState(
            _fn,
            outputStructType=CHANGEPOINT_OUTPUT_DDL,
            stateStructType=CHANGEPOINT_STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

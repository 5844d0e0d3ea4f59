"""Streaming experiment guardrails: the online twins of batch X89
`srm_check` and X119 `wasserstein_value_drift` (operators/stats.py) —
the two checks a trustworthy A/B platform runs CONTINUOUSLY, because
both invalidate an experiment the moment they fire (Fabijan 2019: you
stop, you do not "adjust").

Two streams, two established state disciplines:

1. **SRM** needs DISTINCT units per (type, arm) — unbounded distinct
   state if held naively. Decomposition copied from
   `engagement_stream`: a per-(type, user) stateful first-seen pass
   emits each pair ONCE as an append-only delta; the readout runs the
   UNCHANGED batch `srm_check` core over the delta ledger, so the
   streaming answer is bit-identical to batch by construction. State
   per key is one empty struct (existence), the smallest possible.

2. **Wasserstein** needs the full per-value histogram for exactness —
   unbounded. The streaming form pays the standard price: values bin
   onto a FIXED per-type grid trained OFFLINE from a reference window
   (exact rank-based edges, the anomaly_stream offline-target
   handoff), and state per type is 2×(n_bins+1) exact integer counts.
   W1 on the binned support is exact integer algebra over that state
   — reproducible under any batch slicing — and `binned_w1` is the
   batch twin computing the same statistic from a static frame, so
   parity is testable bit-for-bit. The un-binned exact form remains
   the batch-only `wasserstein_value_drift`.

The alarm latches (the anomaly_stream convention): once a batch has
seen SRM χ² or W1 over threshold, the flag stays up even if later
data walks the statistic back — a guardrail that un-fires is a
guardrail nobody trusts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sampling import hash_bucket_col

UNIT_OUTPUT_DDL = "t STRING, u STRING"
UNIT_STATE_DDL = "seen BOOLEAN"

W1_OUTPUT_DDL = (
    "event_type STRING, n_a BIGINT, n_b BIGINT, w1_milli DOUBLE, "
    "alarm BOOLEAN"
)
W1_STATE_DDL = (
    "hist_a ARRAY<BIGINT>, hist_b ARRAY<BIGINT>, latched BOOLEAN"
)


def streaming_unit_deltas(
    events_stream: DataFrame,
    unit_col: str = "user_id",
    group_col: str = "event_type",
) -> DataFrame:
    """Append-mode stream of first-seen (type, unit) pairs — the SRM
    delta ledger. Keyed by the pair itself so state per key is a
    single existence bit; re-keying by type would hold a per-type
    user SET (the unbounded shape this decomposition exists to
    avoid)."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        t, u = key
        for _ in pdfs:  # row contents are irrelevant; the KEY is the fact
            pass
        if state.exists:
            return
        state.update((True,))
        yield pd.DataFrame({"t": [t], "u": [u]})

    base = events_stream.where(
        F.col(unit_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("t"),
        F.col(unit_col).cast("string").alias("u"),
    )
    return base.groupBy("t", "u").applyInPandasWithState(
        _fn,
        outputStructType=UNIT_OUTPUT_DDL,
        stateStructType=UNIT_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def srm_from_ledger(unit_deltas: DataFrame) -> DataFrame:
    """Batch readout over the delta ledger: the UNCHANGED batch
    `srm_check` core (distinct() inside absorbs any replayed deltas),
    so streaming SRM == batch SRM on the same events, bit for bit."""
    from ..operators.stats import srm_check

    return srm_check(
        unit_deltas.select(
            F.col("t").alias("event_type"), F.col("u").alias("user_id")
        ),
        unit_col="user_id",
        group_col="event_type",
    )


def train_value_bins(
    events: DataFrame,
    n_bins: int = 16,
    group_col: str = "event_type",
    value_col: str = "value",
) -> dict[str, list[int]]:
    """Offline per-type bin edges in exact milli-ints: the reference
    window's rank-⌈q·n⌉ order statistics at q = 1/n_bins .. (n_bins−1)
    /n_bins (the embedding_clip_bounds convention), deduplicated and
    sorted. Driver state is ≤ n_bins−1 ints per type — the same
    bounded class as anomaly_stream's targets."""
    from pyspark.sql import Window

    v = F.round(F.col(value_col).cast("double") * 1000.0).cast("long")
    base = events.where(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(F.col(group_col).alias("t"), v.alias("v"))
    w = Window.partitionBy("t").orderBy("v")
    wn = Window.partitionBy("t")
    ranked = base.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    # rank targets depend on n per type, so filter row-wise
    cond = None
    for i in range(1, n_bins):
        c = F.col("rk") == F.expr(f"cast(ceil({i / n_bins} * n) as bigint)")
        cond = c if cond is None else cond | c
    rows = ranked.where(cond).select("t", "v").collect()
    out: dict[str, list[int]] = {}
    for r in rows:
        out.setdefault(r["t"], []).append(int(r["v"]))
    return {t: sorted(set(vs)) for t, vs in out.items()}


def _binned_w1_milli(
    hist_a: list[int], hist_b: list[int], edges: list[int]
) -> float:
    """Exact W1 between two binned distributions whose support is the
    edge grid (bin i < len(edges) represents mass AT edges[i]; the
    underflow bin 0 collapses onto edges[0] and the overflow bin
    onto edges[-1] — a one-sided clamp both the stream and the batch
    twin apply identically). Integer cross-multiplied
    cumulative gaps, one double division at the end (milli units,
    6 dp)."""
    n_a, n_b = sum(hist_a), sum(hist_b)
    if n_a == 0 or n_b == 0 or len(edges) < 2:
        return 0.0
    # support points: edges[0] carries bins 0 and 1's mass boundary —
    # collapse underflow into the first edge
    pts = list(edges)
    cum_a = hist_a[0] + hist_a[1]
    cum_b = hist_b[0] + hist_b[1]
    total = 0.0
    for i in range(1, len(pts)):
        dx = pts[i] - pts[i - 1]
        total += float(dx) * abs(
            float(cum_a) * float(n_b) - float(cum_b) * float(n_a)
        )
        cum_a += hist_a[i + 1]
        cum_b += hist_b[i + 1]
    return round(total / (float(n_a) * float(n_b)), 6)


def _bin_index(v: int, edges: list[int]) -> int:
    """Bin 0: v < edges[0]; bin i (1..len): edges[i-1] <= v < edges[i];
    last bin: v >= edges[-1]. Pure integer compares — deterministic."""
    import bisect

    return bisect.bisect_right(edges, v)


def streaming_binned_w1_monitor(
    events_stream: DataFrame,
    bins_milli: dict[str, list[int]],
    alarm_w1_milli: float,
    unit_col: str = "user_id",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-type streaming Wasserstein drift between the two md5 hash
    arms on the trained bin grid: one update row per type per batch
    with exact integer histogram state and a latched alarm. Types
    without trained bins are skipped (no grid to bin onto)."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (group,) = key
        edges = bins_milli.get(group)
        if not edges or len(edges) < 2:
            for _ in pdfs:
                pass
            return
        k = len(edges) + 1
        if state.exists:
            hist_a, hist_b, latched = state.get
            hist_a, hist_b = list(hist_a), list(hist_b)
        else:
            hist_a, hist_b, latched = [0] * k, [0] * k, False
        for pdf in pdfs:
            for is_a, v in zip(pdf["is_a"], pdf["v"]):
                idx = _bin_index(int(v), edges)
                if bool(is_a):
                    hist_a[idx] += 1
                else:
                    hist_b[idx] += 1
        w1 = _binned_w1_milli(hist_a, hist_b, edges)
        latched = bool(latched or w1 > alarm_w1_milli)
        state.update((hist_a, hist_b, latched))
        yield pd.DataFrame(
            {
                "event_type": [group],
                "n_a": [sum(hist_a)],
                "n_b": [sum(hist_b)],
                "w1_milli": [w1],
                "alarm": [latched],
            }
        )

    base = events_stream.where(
        F.col(unit_col).isNotNull()
        & F.col(group_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("t"),
        (hash_bucket_col(F.col(unit_col), 1) < F.lit("8")).alias("is_a"),
        F.round(F.col(value_col).cast("double") * 1000.0)
        .cast("long")
        .alias("v"),
    )
    return base.groupBy("t").applyInPandasWithState(
        _fn,
        outputStructType=W1_OUTPUT_DDL,
        stateStructType=W1_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def binned_w1(
    events: DataFrame,
    bins_milli: dict[str, list[int]],
    unit_col: str = "user_id",
    group_col: str = "event_type",
    value_col: str = "value",
) -> dict[str, tuple[int, int, float]]:
    """Batch twin: the same binned-W1 statistic computed from a static
    frame — per-type (n_a, n_b, w1_milli), bit-identical to the
    stream's final emission over the same events (same integer
    histograms, same python reduction)."""
    base = (
        events.where(
            F.col(unit_col).isNotNull()
            & F.col(group_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .select(
            F.col(group_col).cast("string").alias("t"),
            (hash_bucket_col(F.col(unit_col), 1) < F.lit("8")).alias("is_a"),
            F.round(F.col(value_col).cast("double") * 1000.0)
            .cast("long")
            .alias("v"),
        )
        .groupBy("t", "is_a", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    )
    hists: dict[str, tuple[list[int], list[int]]] = {}
    for r in base:
        edges = bins_milli.get(r["t"])
        if not edges or len(edges) < 2:
            continue
        k = len(edges) + 1
        ha, hb = hists.setdefault(r["t"], ([0] * k, [0] * k))
        idx = _bin_index(int(r["v"]), edges)
        (ha if r["is_a"] else hb)[idx] += int(r["c"])
    return {
        t: (sum(ha), sum(hb), _binned_w1_milli(ha, hb, bins_milli[t]))
        for t, (ha, hb) in hists.items()
    }

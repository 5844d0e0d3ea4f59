"""Property-based parity: temporal.asof_join vs pandas.merge_asof
(the canonical as-of reference implementation) on generated event sets.

One Spark job per example set (batched via a single generated list) —
the union+window formulation must agree with merge_asof's
backward-inclusive semantics for every key/timestamp shape, including
ties handled by pre-deduping the right side.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    temporal,
)

BASE = datetime(2024, 1, 1)

# (key, seconds-offset) pairs; small key space forces collisions,
# duplicate offsets force boundary ties
EVENTS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(left=EVENTS, right=EVENTS)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    lrows = [
        (i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(left)
    ]
    # dedupe right on (key, ts): keep max payload id (mirrors the
    # pre-dedup the operator documents for tie determinism)
    rbest: dict[tuple[int, datetime], int] = {}
    for j, (k, s) in enumerate(right):
        key = (k, BASE + timedelta(seconds=s))
        rbest[key] = max(rbest.get(key, -1), j)
    rrows = [(k, ts, j) for (k, ts), j in rbest.items()]

    ldf = spark.createDataFrame(
        lrows or [(0, 0, BASE)], "lid long, k long, ts timestamp"
    )
    rdf = spark.createDataFrame(
        rrows or [(99, BASE - timedelta(days=1), -1)],
        "k long, ts timestamp, rid long",
    )
    if not lrows:
        ldf = ldf.limit(0)
    if not rrows:
        rdf = rdf.limit(0)

    got = {
        r["lid"]: r["rid"]
        for r in temporal.asof_join(ldf, rdf, key="k").collect()
    }

    lpdf = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts", kind="mergesort")
    rpdf = pd.DataFrame(rrows, columns=["k", "ts", "rid"]).sort_values("ts", kind="mergesort")
    if lpdf.empty:
        assert got == {}
        return
    if rpdf.empty:
        expected = {lid: None for lid in lpdf["lid"]}
    else:
        merged = pd.merge_asof(
            lpdf, rpdf, on="ts", by="k", direction="backward", allow_exact_matches=True
        )
        expected = {
            int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in merged.itertuples()
        }
    assert got == expected

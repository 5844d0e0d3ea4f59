"""Property-based parity for temporal.interval_join_batch: the keyed
equi-join + residual formulation must agree with the brute-force
predicate for every key/timestamp shape, including boundary ties at
both interval ends."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    temporal,
)

BASE = datetime(2024, 1, 1)
HORIZON_S = 3600

# small key space forces collisions; offsets in minutes so many pairs
# straddle the 1-hour horizon boundary exactly
EVENTS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 120)),
    min_size=0,
    max_size=20,
)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(clicks=EVENTS, purchases=EVENTS)
def test_interval_join_matches_bruteforce(spark, clicks, purchases):
    crows = [
        (i, k, BASE + timedelta(minutes=m)) for i, (k, m) in enumerate(clicks)
    ]
    prows = [
        (1000 + j, k, BASE + timedelta(minutes=m), float(j))
        for j, (k, m) in enumerate(purchases)
    ]

    cdf = spark.createDataFrame(
        crows or [(0, 0, BASE)], "event_id long, user_id long, ts timestamp"
    )
    pdf = spark.createDataFrame(
        prows or [(0, 0, BASE, 0.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    if not crows:
        cdf = cdf.limit(0)
    if not prows:
        pdf = pdf.limit(0)

    got = {
        (r["purchase_id"], r["click_id"])
        for r in temporal.interval_join_batch(cdf, pdf, horizon="1 hour").collect()
    }
    expected = {
        (pid, cid)
        for (cid, ck, cts) in crows
        for (pid, pk, pts, _v) in prows
        if ck == pk and cts <= pts and (pts - cts).total_seconds() <= HORIZON_S
    }
    assert got == expected

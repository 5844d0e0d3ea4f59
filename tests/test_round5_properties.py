"""Property-based exactness for the round-5 statistics/selection
operators: Spark results vs plain-Python replicas over
hypothesis-generated inputs. Each example list evaluates in a single
Spark job (the test_property_based.py idiom)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
    unimax_weights,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
    ks_test,
    weighted_quantiles,
)

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _arm(uid: int) -> int:
    return 1 if hashlib.md5(str(uid).encode()).hexdigest()[0] < "8" else 0


def _py_ks(rows):
    """Exact two-sample KS replica: rows = [(uid, value)]."""
    a = sorted(v for u, v in rows if _arm(u))
    b = sorted(v for u, v in rows if not _arm(u))
    if not a or not b:
        return None
    vals = sorted(set(a + b))
    na, nb = len(a), len(b)
    best = 0
    for v in vals:
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        best = max(best, abs(ca * nb - cb * na))
    return na, nb, round(best / (na * nb), 6)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.sampled_from([1.0, 2.0, 3.0, 5.0, 8.0, 13.0]),
        ),
        min_size=4,
        max_size=40,
    )
)
@SLOW
def test_ks_matches_python_replica(spark, rows):
    ev = spark.createDataFrame(
        [(u, "t", v) for u, v in rows],
        "user_id long, event_type string, value double",
    )
    got = ks_test(ev).collect()
    want = _py_ks(rows)
    if want is None:
        assert got == []
        return
    assert len(got) == 1
    r = got[0]
    assert (r["n_a"], r["n_b"], r["d_stat"]) == want
    assert 0.0 <= r["d_stat"] <= 1.0
    assert 0.0 <= r["p_approx"] <= 1.0


def _py_unimax(tokens: dict[str, int], budget: int, max_epochs: int):
    caps = sorted((t * max_epochs, lang) for lang, t in tokens.items())
    ln = len(caps)
    prefix = 0
    pivot, t_alloc = None, None
    prev_cap = 0
    for j, (cap, _lang) in enumerate(caps, start=1):
        tn, td = budget - prefix, ln - j + 1
        if cap * td >= tn and prev_cap * td <= tn:
            pivot, t_alloc = j, tn // td
            break
        prefix += cap
        prev_cap = cap
    out = {}
    for j, (cap, lang) in enumerate(caps, start=1):
        if pivot is None or j < pivot:
            out[lang] = cap
        else:
            out[lang] = min(cap, t_alloc)
    return out


@given(
    st.dictionaries(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        st.integers(min_value=1, max_value=200),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=0, max_value=3000),
)
@SLOW
def test_unimax_matches_python_water_filling(spark, tokens, budget):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * t), lang) for i, (lang, t) in enumerate(tokens.items())],
        "doc_id long, text string, lang string",
    )
    got = {
        r["lang"]: r["alloc"]
        for r in unimax_weights(docs, budget, max_epochs=2).collect()
    }
    want = _py_unimax(tokens, budget, 2)
    assert got == want
    # invariants: never over capacity, never over budget in total
    for lang, alloc in got.items():
        assert 0 <= alloc <= tokens[lang] * 2
    assert sum(got.values()) <= max(budget, 0) or sum(got.values()) == sum(
        t * 2 for t in tokens.values()
    )


def _py_wq(cents: list[int], qs=(250, 500, 750, 900)):
    agg: dict[int, int] = {}
    for c in cents:
        agg[c] = agg.get(c, 0) + c
    total = sum(agg.values())
    out = []
    for q in qs:
        cum = 0
        pick = None
        for c in sorted(agg):
            cum += agg[c]
            if cum * 1000 >= total * q:
                pick = c
                break
        out.append(round(pick / 100.0, 2))
    return tuple(out)


@given(
    st.lists(st.integers(min_value=1, max_value=9999), min_size=1, max_size=30)
)
@SLOW
def test_weighted_quantiles_match_python_replica(spark, cents):
    df = spark.createDataFrame(
        [("g", c / 100.0) for c in cents], "grp string, amt double"
    )
    r = weighted_quantiles(df, "grp", "amt").collect()[0]
    assert (r["wq_250"], r["wq_500"], r["wq_750"], r["wq_900"]) == _py_wq(cents)
    assert r["wq_250"] <= r["wq_500"] <= r["wq_750"] <= r["wq_900"]

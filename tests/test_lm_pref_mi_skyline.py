"""Semantics pins: bigram LM, preference pairs, mutual information,
Pareto skyline."""

from __future__ import annotations

import math

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.corpus import (
    preference_pairs,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.profiling import (
    mutual_information,
    skyline_pareto,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
    bigram_lm_topk,
)


def test_bigram_lm_hand_counts(spark):
    """'a b a b' -> c(a,b)=2, c(b,a)=1; V=2 successors;
    P(b|a)=(2+1)/(2+2)=750 milli, P(a|b)=(1+1)/(1+2)=666 milli."""
    docs = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    out = {(r["w1"], r["w2"]): r for r in bigram_lm_topk(docs, top_n=10).collect()}
    ab, ba = out[("a", "b")], out[("b", "a")]
    assert (ab["c_bigram"], ab["c1"]) == (2, 2)
    assert (ba["c_bigram"], ba["c1"]) == (1, 1)
    assert ab["condprob_milli"] == 750
    assert ba["condprob_milli"] == 666


def test_bigram_lm_skips_short_docs_and_limits(spark):
    docs = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "x y")], "doc_id long, text string"
    )
    out = bigram_lm_topk(docs, top_n=10).collect()
    assert [(r["w1"], r["w2"]) for r in out] == [("x", "y")]


def test_preference_pairs_tiebreaks_and_singletons(spark):
    rows = [
        # group (s1, en): identical scores -> chosen lowest id,
        # rejected highest id, margin 0
        (1, 0.5, "s1", "en"),
        (2, 0.5, "s1", "en"),
        (3, 0.5, "s1", "en"),
        # group (s2, en): singleton -> excluded
        (9, 0.9, "s2", "en"),
        # group (s3, de): clear winner/loser
        (4, 0.9, "s3", "de"),
        (5, 0.1, "s3", "de"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, quality_score double, source string, lang string"
    )
    out = {(r["source"], r["lang"]): r for r in preference_pairs(df).collect()}
    assert set(out) == {("s1", "en"), ("s3", "de")}
    t = out[("s1", "en")]
    assert (t["chosen_id"], t["rejected_id"], t["margin_dm"]) == (1, 3, 0)
    c = out[("s3", "de")]
    assert (c["chosen_id"], c["rejected_id"]) == (4, 5)
    assert c["margin_dm"] == 8000  # (0.9 - 0.1) * 10^4


def test_mutual_info_independent_is_zero(spark):
    """Uniform product distribution -> MI exactly 0 after rounding;
    entropies = ln(2) = 693 milli-nats."""
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")] * 5
    df = spark.createDataFrame(rows, "u string, v string")
    r = mutual_information(df, "u", "v").collect()[0]
    assert r["n_rows"] == 20
    assert r["mi_milli"] == 0
    assert r["h_a_milli"] == round(1000 * math.log(2))
    assert r["h_b_milli"] == round(1000 * math.log(2))


def test_mutual_info_deterministic_function(spark):
    """v = f(u) bijective -> MI = H(u) = H(v)."""
    rows = [("a", "x"), ("b", "y"), ("a", "x"), ("b", "y")]
    df = spark.createDataFrame(rows, "u string, v string")
    r = mutual_information(df, "u", "v").collect()[0]
    assert r["mi_milli"] == r["h_a_milli"] == r["h_b_milli"] == round(
        1000 * math.log(2)
    )


def test_skyline_hand_case_with_ties_and_duplicates(spark):
    """min price, max size. Frontier: (1, p=1, s=5), duplicates
    (2,3: p=2, s=7) both kept (equal points don't dominate each
    other), (4: p=2, s=6) dominated by same-price bigger size,
    (5: p=3, s=7) dominated by p=2,s=7 (equal size, worse price),
    (6: p=4, s=9) survives (bigger size than everything cheaper)."""
    rows = [
        (1, 1.0, 5),
        (2, 2.0, 7),
        (3, 2.0, 7),
        (4, 2.0, 6),
        (5, 3.0, 7),
        (6, 4.0, 9),
    ]
    df = spark.createDataFrame(rows, "id long, price double, size int")
    out = sorted(r["id"] for r in skyline_pareto(df, "price", "size", "id").collect())
    assert out == [1, 2, 3, 6]


def test_skyline_single_point(spark):
    df = spark.createDataFrame([(1, 1.0, 1)], "id long, price double, size int")
    out = skyline_pareto(df, "price", "size", "id").collect()
    assert len(out) == 1 and out[0]["id"] == 1

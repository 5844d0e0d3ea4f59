"""SymSpell-style fuzzy matching (operators/fuzzy.py): completeness
against brute-force Levenshtein, planted-typo mining, and the
deletion-variant expression vs a Python reference."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.fuzzy import (
    deletion_variants_col,
    fuzzy_self_pairs,
    typo_candidates,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_deletion_variants_match_python(spark):
    words = ["abc", "a", "", "hello"]
    df = spark.createDataFrame([Row(s=w) for w in words])
    got = {
        r["s"]: sorted(r["v"])
        for r in df.select("s", deletion_variants_col("s").alias("v")).collect()
    }
    for w in words:
        expect = sorted({w} | {w[:i] + w[i + 1 :] for i in range(max(len(w), 1))})
        assert got[w] == expect, w


def test_fuzzy_pairs_complete_vs_bruteforce(spark):
    """Every edit-distance-1 pair over a random-ish word set must be
    found — the SymSpell neighborhood-intersection guarantee."""
    import random

    rng = random.Random(11)
    alpha = "ab"
    words = sorted({"".join(rng.choice(alpha) for _ in range(rng.randint(1, 5)))
                    for _ in range(60)})
    df = spark.createDataFrame([Row(s=w) for w in words])
    got = {
        (r["s_a"], r["s_b"]) for r in fuzzy_self_pairs(df).collect()
    }
    expect = {
        (a, b)
        for i, a in enumerate(words)
        for b in words[i + 1 :]
        if _lev(a, b) == 1
    }
    assert got == expect
    assert expect  # the generated set genuinely exercises the path


def test_typo_candidates_surfaces_planted_misspelling(spark):
    # deletion typo: 'quic' IS edit-1 from 'quick' (a transposition
    # like 'quikc' would be 2 edits and rightly not surface)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="the quick brown fox") for i in range(20)]
        + [Row(doc_id=99, text="the quic brown fox")]
    )
    out = {
        (r["s_a"], r["s_b"]): (r["n_a"], r["n_b"])
        for r in typo_candidates(docs, vocab_size=100).collect()
    }
    assert ("quic", "quick") in out
    n_a, n_b = out[("quic", "quick")]
    assert n_a == 1 and n_b == 20  # rare-vs-frequent: the typo signal


def test_fuzzy_join_links_misspellings_to_canonical(spark):
    canonical = spark.createDataFrame(
        [Row(name=n) for n in ["london", "paris", "berlin", "madrid"]]
    )
    probe = spark.createDataFrame(
        [Row(q=n) for n in ["londn", "paris", "berlinn", "tokyo", "madird"]]
    )
    got = {
        (r["q"], r["name"]): r["dist"]
        for r in __import__(
            "csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.fuzzy",
            fromlist=["fuzzy_join"],
        ).fuzzy_join(probe, canonical, "q", "name").collect()
    }
    assert got == {
        ("londn", "london"): 1,   # deletion typo
        ("paris", "paris"): 0,    # exact
        ("berlinn", "berlin"): 1, # insertion typo
        # 'madird' is a transposition (2 edits) → correctly unmatched
        # 'tokyo' has no canonical neighbor → unmatched
    }


def test_jaro_winkler_py_bitexact_vs_duckdb(duck):
    """The pandas-UDF JW must be bit-identical to the DuckDB oracle's
    jaro_winkler_similarity — random strings incl. empties, repeats,
    and name-shaped inputs (the boost-threshold and both-empty edge
    cases are where textbook implementations diverge)."""
    import random
    import string

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.fuzzy import (
        jaro_winkler_py,
    )

    rng = random.Random(42)
    cases = [("", ""), ("", "a"), ("a", ""), ("a", "a"), ("a", "b"),
             ("martha", "marhta"), ("dixon", "dicksonx"),
             ("Customer#000000001", "Customer#000000010")]
    for _ in range(1500):
        a = "".join(rng.choices(string.ascii_lowercase[:6] + "# 01", k=rng.randint(0, 12)))
        b = "".join(rng.choices(string.ascii_lowercase[:6] + "# 01", k=rng.randint(0, 12)))
        cases.append((a, b))
    for a, b in cases:
        d = duck.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler_py(a, b) == d, (a, b)


def test_jaro_winkler_topk_ranks_and_ties(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.fuzzy import (
        jaro_winkler_topk,
    )

    names = spark.createDataFrame(
        [("martha",), ("marhta",), ("marta",), ("bob",), ("mort",)], "name string"
    )
    probes = spark.createDataFrame([("martha",)], "probe string")
    got = jaro_winkler_topk(names, probes, k=3).collect()
    assert [r["rk"] for r in got] == [1, 2, 3]
    # probe itself excluded; the two transposition/deletion variants win
    assert got[0]["name"] in {"marhta", "marta"}
    assert "martha" not in {r["name"] for r in got}
    # scores descend, ties impossible to leave unordered (name asc)
    jws = [r["jw"] for r in got]
    assert jws == sorted(jws, reverse=True)
    assert all(0.0 <= v <= 1.0 for v in jws)


def test_golden_record_survivorship_rules(spark):
    """Hand-built cluster: head name from the minimum id, MAX balance,
    most-frequent segment with smallest-value tiebreak, conflict count
    on nation; the unlinked record passes through as its own entity."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.fuzzy import (
        golden_record,
    )

    recs = spark.createDataFrame(
        [
            (1, "acme corp", 10, 5.0, "A"),
            (2, "acme corp.", 10, 9.0, "B"),
            (3, "acme corps", 11, 7.0, "B"),
            (9, "zenith llc", 20, 1.0, "C"),
        ],
        "id long, name string, nation int, bal double, seg string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "node_id long, cluster_id long"
    )
    out = {
        r["cluster_id"]: r
        for r in golden_record(
            recs, clusters, "id", "name",
            max_cols=["bal"], mode_cols=["seg"], distinct_cols=["nation"],
        ).collect()
    }
    assert set(out) == {1, 9}
    g = out[1]
    assert g["n_members"] == 3
    assert g["name"] == "acme corp"      # head = member with id == cluster_id
    assert g["bal_max"] == 9.0           # best value wins
    assert g["seg"] == "B"               # 2×B beats 1×A
    assert g["n_nation"] == 2            # genuine disagreement surfaced
    s = out[9]
    assert s["n_members"] == 1 and s["name"] == "zenith llc"


def test_golden_record_mode_tie_breaks_to_smallest(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.fuzzy import (
        golden_record,
    )

    recs = spark.createDataFrame(
        [(1, "x", "B"), (2, "y", "A")], "id long, name string, seg string"
    )
    clusters = spark.createDataFrame([(1, 1), (2, 1)], "node_id long, cluster_id long")
    out = golden_record(recs, clusters, "id", "name", mode_cols=["seg"]).collect()
    assert len(out) == 1 and out[0]["seg"] == "A"  # 1-1 tie → smallest

"""Behavior tests for the round-6 session-2 operators (X87+): planted
micro-fixtures pinning the window semantics the DuckDB oracle states
only implicitly."""

from __future__ import annotations


def test_active_user_rollup_window_semantics(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        active_user_rollup,
    )

    rows = [
        (1, "2024-01-01 10:00:00"),  # u1: day 0 only
        (2, "2024-01-01 11:00:00"),  # u2: days 0 and 7
        (2, "2024-01-08 11:00:00"),
        (3, "2024-01-30 09:00:00"),  # u3 extends the report horizon
    ]
    df = spark.createDataFrame(
        [(u, t) for u, t in rows], "user_id long, ts string"
    ).selectExpr("user_id", "cast(ts as timestamp) as ts")
    got = {r["day"]: r.asDict() for r in active_user_rollup(df).collect()}

    assert len(got) == 30  # Jan 1 .. Jan 30 inclusive, nothing past max
    assert (got["2024-01-01"]["dau"], got["2024-01-01"]["wau"], got["2024-01-01"]["mau"]) == (2, 2, 2)
    # day 7 (Jan 8): u1's offset is 7 -> out of WAU; u2 re-active
    assert (got["2024-01-08"]["dau"], got["2024-01-08"]["wau"], got["2024-01-08"]["mau"]) == (1, 1, 2)
    # Jan 7: both still within the 7-day window
    assert got["2024-01-07"]["wau"] == 2 and got["2024-01-07"]["dau"] == 0
    # Jan 30: u1 offset 29 (MAU edge, in), u2 offset 22, u3 active
    assert (got["2024-01-30"]["dau"], got["2024-01-30"]["wau"], got["2024-01-30"]["mau"]) == (1, 1, 3)
    # quiet middle days: trailing windows still count; Jan 14 is u2's
    # last WAU day (offset 6 from Jan 8), Jan 15 the first without
    assert (got["2024-01-14"]["dau"], got["2024-01-14"]["wau"], got["2024-01-14"]["mau"]) == (0, 1, 2)
    assert (got["2024-01-15"]["dau"], got["2024-01-15"]["wau"], got["2024-01-15"]["mau"]) == (0, 0, 2)


def test_blocking_eval_identities(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup import (
        minhash_blocking_eval,
    )

    # 3 exact-duplicate pairs + 4 unrelated docs
    dups = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine",
        "red green blue yellow purple orange cyan pink",
    ]
    uniq = [
        "completely different words appear in this document text",
        "spark catalyst tungsten shuffle partition broadcast join",
        "quick brown fox jumps over the lazy sleeping dog",
        "lorem ipsum dolor sit amet consectetur adipiscing elit",
    ]
    texts = [t for d in dups for t in (d, d)] + uniq
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # truth_sample_milli=1000 = exhaustive truth: explicit-arg-only since
    # round 7 (the scale-safe sampled estimator is the default)
    row = minhash_blocking_eval(df, truth_sample_milli=1000).collect()[0].asDict()
    assert row["n_docs"] == 10
    assert row["total_pairs"] == 45
    # identical docs share every shingle -> truth catches all 3 pairs,
    # and identical signatures collide in every band -> all captured
    assert row["n_true_pairs"] == 3
    assert row["n_captured"] == 3
    assert row["pairs_completeness_milli"] == 1000
    assert row["n_candidate_pairs"] >= 3
    assert row["reduction_ratio_milli"] <= 1000
    # captured is bounded by both sides
    assert row["n_captured"] <= min(row["n_true_pairs"], row["n_candidate_pairs"])


def test_blocking_eval_no_dups_corpus(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup import (
        minhash_blocking_eval,
    )

    df = spark.createDataFrame(
        [
            (0, "aa bb cc dd ee"),
            (1, "ff gg hh ii jj"),
            (2, "kk ll mm nn oo"),
        ],
        "doc_id long, text string",
    )
    row = minhash_blocking_eval(df, truth_sample_milli=1000).collect()[0].asDict()
    assert row["n_true_pairs"] == 0
    assert row["n_captured"] == 0
    assert row["pairs_completeness_milli"] == 0  # guarded div


def test_ab_power_closed_form(spark):
    import math

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        ab_power_analysis,
    )

    # 200 units; one event type converted by a deterministic subset
    rows = [(u, "view") for u in range(200)]
    rows += [(u, "buy") for u in range(200) if u % 5 == 0]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {r["event_type"]: r.asDict() for r in ab_power_analysis(df).collect()}

    buy = got["buy"]
    p1 = buy["conv_a"] / buy["users_a"]
    p2, za, zb = p1 * 1.1, 1.959964, 0.841621
    pb = (p1 + p2) / 2
    n = (
        za * math.sqrt(2 * pb * (1 - pb))
        + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
    ) ** 2 / (p2 - p1) ** 2
    assert buy["n_req_80"] == math.ceil(round(n, 6))
    assert buy["n_req_90"] > buy["n_req_80"]  # more power, more sample
    assert buy["coverage_milli_80"] == (1000 * buy["users_a"]) // buy["n_req_80"]
    # 100% baseline conversion is degenerate -> NULL sizes
    assert got["view"]["n_req_80"] is None


def test_rocchio_expand_prefers_rare_cooccurring_terms(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.retrieval import (
        rocchio_expand,
    )

    # "signal" co-occurs with the query term only in relevant docs;
    # "common" appears everywhere (high df -> low odds-idf)
    rel = ["query signal common extra" for _ in range(3)]
    noise = ["common filler words here" for _ in range(5)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rel + noise)], "doc_id long, text string"
    )
    got = rocchio_expand(df, ["query"], k=3, top_terms=5).collect()
    terms = [r["term"] for r in got]
    assert "query" not in terms  # original query excluded
    w = {r["term"]: r["weight_e6"] for r in got}
    # same tf_rel(3 each), but signal/extra have df=3 vs common df=8
    assert w["signal"] > w["common"]
    assert w["signal"] == w["extra"]
    row = {r["term"]: r for r in got}["signal"]
    n_docs, dfq, tf = 8, 3, 3
    assert row["weight_e6"] == (1_000_000 * tf * (2 * (n_docs - dfq) + 1)) // (
        2 * dfq + 1
    )


def test_mmr_rerank_diversifies(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        mmr_rerank,
    )

    # query (id 0) points along x; ids 1-3 are near-duplicates of it,
    # id 4 is an orthogonal-ish direction with lower relevance
    vecs = {
        0: [1.0, 0.0, 0.0],
        1: [0.99, 0.14, 0.0],
        2: [0.99, 0.141, 0.0],
        3: [0.99, 0.139, 0.0],
        4: [0.5, 0.0, 0.87],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = [
        r.asDict() for r in mmr_rerank(df, k=3, pool=4, lambda_milli=300).collect()
    ]
    by_rank = {r["mmr_rank"]: r for r in got}
    # rank 1 is pure relevance: one of the near-dups
    assert by_rank[1]["vec_id"] in (1, 2, 3)
    # rank 2 must jump to the diverse vector despite lower relevance
    assert by_rank[2]["vec_id"] == 4
    assert by_rank[2]["rel_e6"] < by_rank[1]["rel_e6"]
    # pure-relevance order would never do that
    rel_sorted = sorted(got, key=lambda r: (-r["rel_e6"], r["vec_id"]))
    assert [r["vec_id"] for r in rel_sorted] != [
        by_rank[i]["vec_id"] for i in (1, 2, 3)
    ]


def test_mmr_rerank_lambda_1000_is_pure_relevance(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        mmr_rerank,
    )

    vecs = {
        0: [1.0, 0.0],
        1: [0.9, 0.1],
        2: [0.8, 0.2],
        3: [0.7, 0.3],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = mmr_rerank(df, k=3, pool=3, lambda_milli=1000).collect()
    ranks = {r["mmr_rank"]: r["vec_id"] for r in got}
    assert [ranks[1], ranks[2], ranks[3]] == [1, 2, 3]


def _ref_dtw(a, b):
    n, m = len(a), len(b)
    import math

    dp = [[math.inf] * (m + 1) for _ in range(n + 1)]
    dp[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]
            )
    return dp[n][m]


def test_dtw_distance_matches_reference_dp(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        dtw_distance,
    )

    series = {
        "a": [9, 1, 1, 1, 2],
        "b": [1, 9, 1, 1, 2],  # spike shifted one day
        "c": [1, 1, 1],        # shorter, flat
        "d": [9, 1, 1, 1, 2],  # identical to a
    }
    rows = []
    for t, vals in series.items():
        for day, c in enumerate(vals):
            for i in range(c):
                rows.append((t, f"2024-03-{day + 1:02d} 00:00:{i:02d}"))
    df = spark.createDataFrame(rows, "event_type string, ts string").selectExpr(
        "event_type", "cast(ts as timestamp) as ts"
    )
    got = {(r["type_a"], r["type_b"]): r.asDict() for r in dtw_distance(df).collect()}
    assert len(got) == 6
    for (ta, tb), r in got.items():
        assert r["dtw"] == _ref_dtw(series[ta], series[tb]), (ta, tb)
    assert got[("a", "d")]["dtw"] == 0
    # elastic alignment beats pointwise L1 on the shifted spike
    l1 = sum(abs(x - y) for x, y in zip(series["a"], series["b"]))
    assert got[("a", "b")]["dtw"] < l1


def test_dtw_distance_max_cells_guard(spark):
    """Pairs whose DP would exceed max_cells must HARD-FAIL with a
    message naming the pair, not silently build a multi-million-cell
    array (r6 ADVICE: nothing upstream enforces day-bounded series)."""
    import pytest as _pytest

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        dtw_distance,
    )

    rows = [
        ("a", "2024-01-01 00:00:00"),
        ("a", "2024-01-10 00:00:00"),  # 10-day grid
        ("b", "2024-01-01 00:00:00"),
        ("b", "2024-01-05 00:00:00"),  # 5-day grid -> nm = 50
    ]
    df = spark.createDataFrame(rows, "event_type string, ts string").selectExpr(
        "event_type", "cast(ts as timestamp) as ts"
    )
    with _pytest.raises(Exception, match="exceeds max_cells"):
        dtw_distance(df, max_cells=49).collect()
    # at exactly the cap it still computes
    assert dtw_distance(df, max_cells=50).collect()[0]["dtw"] is not None


def _xy2d(order, x, y):
    d, s = 0, order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hvalue_matches_reference_walk(spark):
    import random

    from pyspark.sql import functions as F

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.layout import (
        hvalue_col,
    )

    random.seed(11)
    pts = [(random.randint(0, 65535), random.randint(0, 65535)) for _ in range(100)]
    pts += [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 0), (0, 1), (1, 1)]
    df = spark.createDataFrame(sorted(set(pts)), "x long, y long")
    got = {
        (r["x"], r["y"]): r["h"]
        for r in df.select(
            "x", "y", hvalue_col(F.col("x"), F.col("y")).alias("h")
        ).collect()
    }
    assert all(got[p] == _xy2d(65536, *p) for p in got)
    # unit steps along the first quadrant of the curve
    assert got[(0, 0)] == 0 and got[(1, 0)] == 1 and got[(1, 1)] == 2 and got[(0, 1)] == 3


def test_hilbert_zonemap_partitions_all_rows(spark):
    from pyspark.sql import functions as F

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.layout import (
        hilbert_zonemap,
    )

    df = spark.createDataFrame(
        [(i, (i * 37) % 1000, (i * 91) % 365) for i in range(2000)],
        "rid long, k long, d long",
    )
    zm = hilbert_zonemap(df, F.col("k"), F.col("d"), bucket_bits=6).collect()
    assert sum(r["n"] for r in zm) == 2000
    assert all(0 <= r["hbucket"] < 64 for r in zm)
    assert all(r["x_min"] <= r["x_max"] and r["y_min"] <= r["y_max"] for r in zm)


def test_cross_corr_lag_finds_planted_shift(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        cross_corr_lag,
    )

    rows = []
    pattern = [(i % 3) + 1 for i in range(10)]
    for i, c in enumerate(pattern):
        for j in range(c):
            rows.append(("a", f"2024-05-{i + 1:02d} 00:00:{j:02d}"))
            rows.append(("b", f"2024-05-{i + 3:02d} 00:00:{j:02d}"))  # +2 days
    df = spark.createDataFrame(rows, "event_type string, ts string").selectExpr(
        "event_type", "cast(ts as timestamp) as ts"
    )
    got = {r["lag"]: r.asDict() for r in cross_corr_lag(df, max_lag=3).collect()}
    assert len(got) == 7  # one pair, lags -3..3
    # b is a copy of a shifted +2 days: perfect correlation at lag 2
    assert got[2]["r"] == 1.0
    assert all(got[l]["r"] < 1.0 for l in got if l != 2)
    # overlap shrinks by |lag| off the 12-day grid
    assert got[0]["n"] == 12 and got[3]["n"] == 9 and got[-3]["n"] == 9


def test_frequent_itemsets_planted_baskets(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.basket import (
        frequent_itemsets,
    )

    # {1,2,3} appears in 3 baskets; {1,2} additionally in 1 more;
    # item 9 appears once (infrequent -> pruned before any pair)
    baskets = [
        [1, 2, 3],
        [1, 2, 3, 4],
        [1, 2, 3],
        [1, 2, 9],
        [4, 5],
        [4, 5],
    ]
    rows = [(o, p) for o, items in enumerate(baskets) for p in items]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = frequent_itemsets(df).collect()
    pairs = {
        (r["item_a"], r["item_b"]): r["support"]
        for r in got
        if r["set_size"] == 2
    }
    triples = {
        (r["item_a"], r["item_b"], r["item_c"]): r["support"]
        for r in got
        if r["set_size"] == 3
    }
    assert pairs[(1, 2)] == 4 and pairs[(1, 3)] == 3 and pairs[(2, 3)] == 3
    assert pairs[(4, 5)] == 2
    assert triples == {(1, 2, 3): 3}
    # item 9 was pruned: no pair involving it even though {1,9},{2,9} exist once
    assert not any(9 in k for k in pairs)


def test_nelson_aalen_closed_form(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        nelson_aalen,
    )

    # 4 users: lifetimes 0, 0, 2, 5 days; corpus ends day 12 so all
    # are observed (censor horizon 7 days before day 12 = day 5)
    spans = {1: (1, 1), 2: (2, 2), 3: (3, 5), 4: (4, 9)}
    rows = []
    for u, (a, b) in spans.items():
        rows.append((u, f"2024-06-{a:02d} 08:00:00"))
        rows.append((u, f"2024-06-{b:02d} 08:00:00"))
    rows.append((5, "2024-06-12 08:00:00"))  # anchor: censored (dur 0)
    df = spark.createDataFrame(rows, "user_id long, ts string").selectExpr(
        "user_id", "cast(ts as timestamp) as ts"
    )
    got = {r["duration_days"]: r.asDict() for r in nelson_aalen(df).collect()}
    # duration 0: users 1,2 observed + user 5 censored; risk set = all 5
    d0 = got[0]
    assert (d0["n_risk"], d0["n_events"], d0["n_censored"]) == (5, 2, 1)
    assert d0["cum_hazard"] == round(2 / 5, 6)
    assert d0["hazard_var"] == round(2 / 25, 6)
    # duration 2: risk set 2 (users 3,4), one event
    d2 = got[2]
    assert (d2["n_risk"], d2["n_events"]) == (2, 1)
    assert d2["cum_hazard"] == round(2 / 5 + 1 / 2, 6)
    # duration 5: user 4's last activity (06-09) is inside the 7-day
    # horizon before corpus end (06-12) -> right-censored, no event,
    # hazard unchanged from duration 2
    d5 = got[5]
    assert (d5["n_risk"], d5["n_events"], d5["n_censored"]) == (1, 0, 1)
    assert d5["cum_hazard"] == d2["cum_hazard"]
    assert d5["hazard_var"] == d2["hazard_var"]


def test_blocking_eval_truth_equals_bruteforce(spark):
    """The exhaustive (truth_sample_milli=1000) truth side must find exactly the pairs
    an exhaustive python brute force over the same 2-shingle sets
    finds, on a corpus with near-dups at several overlap levels and a
    corpus-hot shingle."""
    import itertools
    import random

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup import (
        minhash_blocking_eval,
    )

    random.seed(23)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(30):
        base = random.sample(vocab, 10) + ["hot", "common"]  # hot pair everywhere
        texts.append(" ".join(base))
        if i % 3 == 0:  # plant a near-dup with one word changed
            mod = list(base)
            mod[2] = "zz%d" % i
            texts.append(" ".join(mod))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    row = minhash_blocking_eval(df, truth_sample_milli=1000).collect()[0].asDict()
    sampled = minhash_blocking_eval(df, truth_sample_milli=500).collect()[0].asDict()

    # brute-force truth in python on the same 2-shingles
    def shingles(t):
        toks = t.split()
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    sets = {i: shingles(t) for i, t in enumerate(texts) if shingles(t)}
    n_true = 0
    for a, b in itertools.combinations(sorted(sets), 2):
        ni = len(sets[a] & sets[b])
        na, nb = len(sets[a]), len(sets[b])
        if 1000 * ni >= 500 * (na + nb - ni):
            n_true += 1
    assert row["n_true_pairs"] == n_true
    assert n_true > 0  # fixture actually plants truth pairs
    assert row["n_docs"] == len(sets) == row["n_docs_sampled"]
    # the sampled variant restricts truth to a doc subset: counts can
    # only shrink, the global candidate side is unchanged
    assert sampled["n_docs_sampled"] < sampled["n_docs"]
    assert sampled["n_true_pairs"] <= row["n_true_pairs"]
    assert sampled["n_candidate_pairs"] == row["n_candidate_pairs"]


def test_did_estimator_planted_lift(spark):
    import hashlib

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        did_estimator,
    )

    def arm(u):
        return "a" if hashlib.md5(str(u).encode()).hexdigest()[0] < "8" else "b"

    rows = []
    # 40 users, one event in each period; arm-b gains +10.00 post,
    # everyone shares a +2.00 secular time trend
    for u in range(40):
        rows.append((u, "2024-01-01 10:00:00", 50.0))
        post = 52.0 + (10.0 if arm(u) == "b" else 0.0)
        rows.append((u, "2024-01-20 10:00:00", post))
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).selectExpr("user_id", "cast(ts as timestamp) as ts", "value")
    r = did_estimator(df).collect()[0].asDict()
    assert r["n_a_pre"] == r["n_a_post"] and r["n_b_pre"] == r["n_b_post"]
    assert r["n_a_pre"] + r["n_b_pre"] == 40
    # the secular +2 trend cancels; only the planted +10 interaction remains
    assert r["mean_a_post"] - r["mean_a_pre"] == 2.0
    assert round(r["did"], 6) == 10.0
    # zero within-cell variance -> se 0, z guarded to 0
    assert r["se"] == 0.0 and r["z"] == 0.0


def test_seasonal_decompose_recovers_planted_weekly_bump(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        seasonal_decompose,
    )

    # 28 days, flat base of 10 events/day plus +3 every dow==0 day
    rows = []
    for d in range(28):
        epoch_day = 19723 + d  # arbitrary anchor
        n = 10 + (3 if epoch_day % 7 == 0 else 0)
        day = f"{1970 + epoch_day // 365}"  # unused; build ts from epoch
        for j in range(n):
            rows.append(("a", epoch_day, j))
    df = spark.createDataFrame(rows, "event_type string, ed long, j long").selectExpr(
        "event_type",
        "timestamp_seconds(ed * 86400 + j) as ts",
    )
    out = seasonal_decompose(df).collect()
    assert len(out) == 22  # 28 days minus 3 on each edge
    for r in out:
        # additive identity holds exactly
        assert 1000 * r["y"] == r["trend_milli"] + r["seasonal_milli"] + r["residual_milli"]
        # constant-level series: trend is the same everywhere
        assert r["trend_milli"] == (1000 * 73) // 7
        assert r["residual_milli"] == 0
    seas = {r["day"]: r["seasonal_milli"] for r in out}
    bumps = [v for v in seas.values() if v > 0]
    assert len(bumps) == 4 and all(v == 13000 - 73000 // 7 for v in bumps)
    assert all(v == 10000 - 73000 // 7 for v in seas.values() if v < 0)


def test_bloom_size_planner_closed_form(spark):
    import math

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.bloom import (
        bloom_size_planner,
    )

    # 10 docs, 2 exact duplicates after normalization -> 9 distinct keys
    texts = [f"doc number {i} words" for i in range(9)] + ["Doc  number 0   words"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["fpp_ppm"]: r.asDict() for r in bloom_size_planner(df).collect()}
    assert got[10000]["n_keys"] == got[1000]["n_keys"] == 9
    for ppm, p in ((10000, 0.01), (1000, 0.001)):
        m = math.ceil(round(9 * (-math.log(p) / math.log(2) ** 2), 6))
        assert got[ppm]["m_bits"] == m
        assert got[ppm]["filter_bytes"] == (m + 7) // 8
        assert got[ppm]["k_hashes"] == round(-math.log(p) / math.log(2))
    assert got[1000]["m_bits"] > got[10000]["m_bits"]


def test_burstiness_profile_separates_poisson_from_bursty(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        burstiness_profile,
    )

    rows = []
    # "flat": exactly 5/day for 10 days -> variance 0, D = 0
    for d in range(10):
        rows += [("flat", 19000 + d, j) for j in range(5)]
    # "bursty": 50 on one day, 0 elsewhere across the same span
    rows += [("bursty", 19000, j) for j in range(50)]
    rows += [("bursty", 19009, 0)]  # anchor the 10-day range, 1 event
    df = spark.createDataFrame(rows, "event_type string, ed long, j long").selectExpr(
        "event_type", "timestamp_seconds(ed * 86400 + j) as ts"
    )
    got = {r["event_type"]: r.asDict() for r in burstiness_profile(df).collect()}
    flat, bursty = got["flat"], got["bursty"]
    assert flat["n_days"] == bursty["n_days"] == 10
    assert flat["dispersion"] == 0.0 and flat["overdispersed"] == 0
    assert bursty["overdispersed"] == 1 and bursty["dispersion"] > 10
    # closed form for the bursty series: mean 5.1, var = sum((y-m)^2)/9
    ys = [51 if False else 0] * 10
    ys[0], ys[9] = 50, 1
    m = sum(ys) / 10
    var = sum((y - m) ** 2 for y in ys) / 9
    assert bursty["dispersion"] == round(var / m, 6)
    assert bursty["chi2"] == round(9 * (var / m), 6)


def test_vocab_growth_planted_curve(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        vocab_growth,
    )

    # 20 docs, 2 per checkpoint (k=10): doc i contributes exactly one
    # NEW word w{i} plus the shared word "base" (introduced by doc 0)
    texts = [f"base w{i}" for i in range(20)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["checkpoint"]: r.asDict() for r in vocab_growth(df).collect()}
    assert sorted(got) == list(range(1, 11))
    assert got[1]["n_docs_cum"] == 2 and got[10]["n_docs_cum"] == 20
    assert got[10]["n_tokens_cum"] == 40
    # vocab: "base" + 2 new per checkpoint -> 3, 5, 7, ... 21
    for ck in range(1, 11):
        assert got[ck]["n_vocab_cum"] == 1 + 2 * ck
        assert got[ck]["new_vocab"] == (3 if ck == 1 else 2)
    # saturated corpus: same text everywhere -> growth flat after ck 1
    df2 = spark.createDataFrame(
        [(i, "just the same words") for i in range(20)],
        "doc_id long, text string",
    )
    got2 = {r["checkpoint"]: r.asDict() for r in vocab_growth(df2).collect()}
    assert got2[1]["n_vocab_cum"] == 4
    assert all(got2[ck]["new_vocab"] == 0 for ck in range(2, 11))

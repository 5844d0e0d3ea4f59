"""Quality/invariant tests for the session-2 corpus and event
analytics (tfidf_topn, term_cooccurrence, event_transitions) beyond
their DuckDB oracle parity: brute-force equivalence on adversarial
micro-corpora and algebraic invariants the oracle cannot state."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.retrieval import (
    tfidf_topn,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
    term_cooccurrence,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
    event_transitions,
)

from .conftest import SF_DIR


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_tfidf_matches_bruteforce(spark):
    texts = [
        "alpha beta beta gamma",
        "alpha alpha delta",
        "  ",  # blank: contributes to N, produces no terms
        "Gamma gamma GAMMA epsilon",  # case folding
    ]
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["tfidf"])
        for r in tfidf_topn(_docs(spark, texts), n=10).collect()
    }
    n_docs = len(texts)
    toks = [t.lower().split() for t in texts]
    df = Counter(term for ts in toks for term in set(ts))
    exp = {}
    for i, ts in enumerate(toks):
        for term, tf in Counter(ts).items():
            idf = math.log((1.0 + n_docs) / (1.0 + df[term])) + 1.0
            exp[(i, term)] = (tf, round(tf * idf, 6))
    assert got == exp


def test_tfidf_rank_orders_within_doc(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = tfidf_topn(docs, n=3)
    # rnk is 1..n, dense from 1, and tfidf non-increasing along it
    bad = (
        out.groupBy("doc_id")
        .agg(
            F.min("rnk").alias("lo"),
            F.max("rnk").alias("hi"),
            F.count("*").alias("c"),
        )
        .filter((F.col("lo") != 1) | (F.col("hi") != F.col("c")))
        .count()
    )
    assert bad == 0
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("rnk")
    dec = out.withColumn("prev", F.lag("tfidf").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("tfidf") > F.col("prev"))
    )
    assert dec.count() == 0


def test_pmi_matches_bruteforce_and_sign(spark):
    # 20 docs: a,b always together (pmi > 0); c,d never together is
    # unobservable (no pair row), but c pairs with a in half the docs
    texts = ["a b filler%d" % (i % 3) for i in range(10)] + [
        "a c other%d" % (i % 3) for i in range(10)
    ]
    out = {
        (r["term_a"], r["term_b"]): (r["n_ab"], r["pmi"])
        for r in term_cooccurrence(
            _docs(spark, texts), vocab_size=50, top_pairs=100
        ).collect()
    }
    n = len(texts)
    # brute force over doc-level distinct terms
    toks = [set(t.split()) for t in texts]
    df = Counter(t for s in toks for t in s)
    pair = Counter()
    for s in toks:
        ss = sorted(s)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                pair[(ss[i], ss[j])] += 1
    exp = {
        p: (c, round(math.log(c * n / (df[p[0]] * df[p[1]])), 6))
        for p, c in pair.items()
    }
    assert out == exp
    # a is ubiquitous (df_a = N), so co-occurring with it carries NO
    # information: pmi(a,b) = ln(n_ab·N / (N·df_b)) = ln(1) = 0
    assert out[("a", "b")] == (10, 0.0)
    # b and filler0 share 4 of 20 docs vs df_b=10, df_filler0=4:
    # ln(4·20/(10·4)) = ln 2 > 0 — a genuine positive association
    assert out[("b", "filler0")][1] > 0
    assert ("c", "d") not in out


def test_transition_probs_sum_to_one(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )

    ev = load_table(spark, str(SF_DIR), "events")
    out = event_transitions(ev)
    sums = (
        out.groupBy("prev_type")
        .agg(F.round(F.sum("prob"), 4).alias("s"), F.sum("n").alias("n"))
        .collect()
    )
    # rounding each prob to 6dp keeps the row sum within 4dp of 1
    assert sums and all(abs(r["s"] - 1.0) <= 1e-3 for r in sums)
    # total transitions = events - users with >=1 event (first event of
    # every user has no predecessor)
    total = sum(r["n"] for r in sums)
    n_events = ev.filter(F.col("user_id").isNotNull()).count()
    n_users = ev.select("user_id").na.drop().distinct().count()
    assert total == n_events - n_users


def test_transitions_chain_edge_cases(spark):
    from datetime import datetime

    t = lambda m: datetime(2024, 1, 1, 12, m)
    rows = [
        (1, 1, "a", t(0)),
        (1, 2, "b", t(1)),
        (1, 3, "a", t(1)),  # same-ts tie: event_id orders b -> a
        (2, 4, "a", t(0)),  # single event: no transitions
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in event_transitions(ev).collect()
    }
    assert got == {("a", "b"): 1, ("b", "a"): 1}


def test_term_divergence_matches_bruteforce(spark):
    import math as _math
    from collections import Counter as _C

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        term_divergence,
    )

    rows = [
        (0, "en", "the cat sat"),
        (1, "en", "the dog ran"),
        (2, "de", "der hund lief"),
        (3, "de", "der the katze"),  # shared term 'the'
        (4, "fr", "le chat"),  # other slice: excluded entirely
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["term"]: (r["c_a"], r["c_b"], r["js_term"])
        for r in term_divergence(docs, "lang", "en", "de", top_k=100).collect()
    }
    ca = _C(t for _, l, x in rows if l == "en" for t in x.split())
    cb = _C(t for _, l, x in rows if l == "de" for t in x.split())
    na, nb = sum(ca.values()), sum(cb.values())
    exp = {}
    for t in set(ca) | set(cb):
        p, q = ca[t] / na, cb[t] / nb
        m = (p + q) / 2
        js = ((p * _math.log(p / m) if p else 0.0) + (q * _math.log(q / m) if q else 0.0)) / 2
        exp[t] = (ca[t], cb[t], round(js, 9))
    assert got == exp
    # slice-exclusive terms carry more divergence than the shared one
    assert got["the"][2] < got["cat"][2]
    # total JS over all terms is within [0, ln 2]
    total = sum(v[2] for v in got.values())
    assert 0.0 <= total <= _math.log(2) + 1e-9


def test_user_value_trend_matches_numpy_ols(spark):
    import numpy as np

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        user_value_trend,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )

    ev = load_table(spark, str(SF_DIR), "events")
    got = {
        r["user_id"]: (r["n_events"], r["slope_per_hour"])
        for r in user_value_trend(ev).collect()
    }
    rows = ev.select("user_id", "ts", "value").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    exp = {}
    for uid, rs in by_user.items():
        us = np.array([int(r["ts"].timestamp() * 1e6) for r in rs], dtype="int64")
        x = (us - us.min()) // 1_000_000  # whole seconds, floored
        y = np.array([r["value"] for r in rs])
        if len(rs) < 2 or np.all(x == x[0]):
            continue
        slope = np.polyfit(x.astype(float), y, 1)[0] * 3600.0
        exp[uid] = (len(rs), slope)
    assert set(got) == set(exp)
    for uid in exp:
        assert got[uid][0] == exp[uid][0]
        assert abs(got[uid][1] - exp[uid][1]) < 1e-4, uid


def test_user_value_trend_excludes_degenerate_users(spark):
    from datetime import datetime

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        user_value_trend,
    )

    t = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t, 1.0),  # single event: excluded
        (2, t, 1.0), (2, t, 5.0),  # two events, SAME second: zero x-variance
        (3, t, 0.0), (3, datetime(2024, 1, 1, 13, 0, 0), 2.0),  # slope 2/hr
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r["user_id"]: r["slope_per_hour"] for r in user_value_trend(ev).collect()}
    assert got == {3: 2.0}


def test_remove_boilerplate_strips_frequent_lines(spark):
    """Line-level production form: the cookie banner shared by 3 of 4
    docs is removed everywhere, unique lines and blank lines survive,
    reassembly preserves order."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        remove_boilerplate,
    )

    banner = "accept all cookies"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nreal content one\n\nmore text"),
            (2, f"intro line\n{banner}\nreal content two"),
            (3, f"{banner}"),
            (4, "entirely unique document"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate(docs, min_df_frac=0.5).collect()
    }
    assert out[1]["clean_text"] == "real content one\n\nmore text"
    assert out[2]["clean_text"] == "intro line\nreal content two"
    assert out[3]["clean_text"] == ""  # banner-only doc empties out
    assert out[4]["clean_text"] == "entirely unique document"
    assert [out[i]["n_removed"] for i in (1, 2, 3, 4)] == [1, 1, 1, 0]


def test_theilsen_matches_bruteforce_median_of_slopes(spark):
    import numpy as np

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        theilsen_trend,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )

    ev = load_table(spark, str(SF_DIR), "events")
    got = {
        r["user_id"]: (r["n_events"], r["n_pairs"], r["slope_per_hour"])
        for r in theilsen_trend(ev).collect()
    }
    rows = ev.select("user_id", "ts", "value").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    exp = {}
    for uid, rs in by_user.items():
        if not (2 <= len(rs) <= 200):
            continue
        us = np.array([int(r["ts"].timestamp() * 1e6) for r in rs], dtype="int64")
        x = (us - us.min()) // 1_000_000
        y = np.array([r["value"] for r in rs])
        slopes = [
            (y[j] - y[i]) / float(x[j] - x[i])
            for i in range(len(rs))
            for j in range(len(rs))
            if x[i] < x[j]
        ]
        if not slopes:
            continue
        exp[uid] = (len(rs), len(slopes), float(np.median(slopes)) * 3600.0)
    assert set(got) == set(exp)
    for uid in exp:
        assert got[uid][0] == exp[uid][0]
        assert got[uid][1] == exp[uid][1]
        assert abs(got[uid][2] - exp[uid][2]) < 1e-4, uid


def test_theilsen_resists_outlier_that_moves_ols(spark):
    """The point of the robust twin: one corrupted event swings the OLS
    slope but leaves the Theil-Sen median essentially unchanged."""
    from datetime import datetime, timedelta

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        theilsen_trend,
        user_value_trend,
    )

    t0 = datetime(2024, 1, 1)
    clean = [(1, t0 + timedelta(hours=i), 10.0 + 2.0 * i) for i in range(10)]
    ev = spark.createDataFrame(clean, "user_id long, ts timestamp, value double")
    base_ts = theilsen_trend(ev).collect()[0]["slope_per_hour"]
    assert abs(base_ts - 2.0) < 1e-6

    dirty = clean + [(1, t0 + timedelta(hours=10), 100000.0)]
    evd = spark.createDataFrame(dirty, "user_id long, ts timestamp, value double")
    ts_slope = theilsen_trend(evd).collect()[0]["slope_per_hour"]
    ols_slope = user_value_trend(evd).collect()[0]["slope_per_hour"]
    assert abs(ts_slope - 2.0) < 1.0  # median barely moves
    assert ols_slope > 100.0  # OLS dragged by the single outlier


def test_theilsen_caps_hot_users(spark):
    """Users past max_events are excluded BEFORE the quadratic pair
    stage — the 100 TB bot-traffic guard, stated in the oracle too."""
    from datetime import datetime, timedelta

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        theilsen_trend,
    )

    t0 = datetime(2024, 1, 1)
    rows = [(1, t0 + timedelta(seconds=i), float(i)) for i in range(12)]
    rows += [(2, t0 + timedelta(seconds=i), float(i)) for i in range(3)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r["user_id"] for r in theilsen_trend(ev, max_events=10).collect()}
    assert got == {2}


def test_doc_char_entropy_closed_forms(spark):
    """Known distributions: uniform-1 char -> 0, two chars 50/50 ->
    ln 2, four chars uniform -> ln 4."""
    import math

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        doc_char_entropy,
    )

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in doc_char_entropy(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["char_entropy"] == 0.0
    assert out[2]["char_entropy"] == round(math.log(2), 6)
    assert out[3]["char_entropy"] == round(math.log(4), 6)
    assert out[3]["n_chars_counted"] == 4


def test_funnel_time_percentiles_planted_gaps(spark):
    """Three converting users with gaps 10/20/40s: p50 is the exact
    middle, p25/p75 interpolate; a B-before-A user does not convert."""
    import datetime

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        funnel_time_percentiles,
    )

    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        (1, at(0), "A"), (1, at(10), "B"),
        (2, at(0), "A"), (2, at(20), "B"),
        (3, at(0), "A"), (3, at(40), "B"),
        (4, at(50), "A"),                 # never converts
        (5, at(0), "B"), (5, at(100), "A"),  # B precedes A: no qualify
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    r = funnel_time_percentiles(ev, "A", "B").collect()[0]
    assert r["n_users"] == 3
    assert (r["p25_s"], r["p50_s"], r["p75_s"]) == (15.0, 20.0, 30.0)


def test_quality_quantile_normalize_properties(spark):
    """Within each source the normalized score is a milli quantile:
    min -> 0, max -> 1000, ties share a value, and ordering follows the
    raw signal."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        quality_quantile_normalize,
    )

    docs = spark.createDataFrame(
        [
            (1, "s1", "aaaa"),        # alpha density 1000
            (2, "s1", "aa11"),        # 500
            (3, "s1", "a111"),        # 250
            (4, "s1", "aa11"),        # 500 (tie with doc 2)
            (5, "s2", "1111"),        # lone doc in source
        ],
        "doc_id long, source string, text string",
    )
    rows = {r["doc_id"]: r for r in quality_quantile_normalize(docs).collect()}
    assert rows[3]["q_norm_milli"] == 0
    assert rows[1]["q_norm_milli"] == 1000
    assert rows[2]["q_norm_milli"] == rows[4]["q_norm_milli"]
    assert 0 < rows[2]["q_norm_milli"] < 1000
    # singleton source: rank 1 of 1 -> 0 (div by greatest(n-1,1))
    assert rows[5]["q_norm_milli"] == 0
    assert rows[1]["q_milli"] == 1000 and rows[2]["q_milli"] == 500


def test_cohens_kappa_identities(spark):
    """Perfect agreement -> kappa 1; independent raters -> kappa ~0
    (exactly 0 when the contingency is exactly the product of
    marginals)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.evaluate import (
        cohens_kappa,
    )

    perfect = spark.createDataFrame(
        [("purchase", 50.0)] * 6 + [("view", 10.0)] * 4,
        "event_type string, value double",
    )
    r = cohens_kappa(perfect).collect()[0]
    assert r["kappa"] == 1.0 and r["n11"] == 6 and r["n00"] == 4

    # 2x2 = product of marginals: a=1 half the time independent of b
    indep = spark.createDataFrame(
        [("purchase", 50.0), ("purchase", 10.0), ("view", 50.0), ("view", 10.0)] * 5,
        "event_type string, value double",
    )
    r = cohens_kappa(indep).collect()[0]
    assert r["kappa"] == 0.0

    # NULLs dropped, not counted
    with_nulls = spark.createDataFrame(
        [("purchase", 50.0), (None, 50.0), ("view", None)],
        "event_type string, value double",
    )
    r = cohens_kappa(with_nulls).collect()[0]
    assert r["n"] == 1


def test_mrr_recall_eval_planted_ranking(spark):
    """Planted tf ranking: the relevant doc at rank 2 gives rr 500;
    recall@10 counts only top-k relevant hits."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.evaluate import (
        mrr_recall_eval,
    )

    docs = spark.createDataFrame(
        [
            (1, "de", "alpha alpha alpha"),          # rank 1, not relevant
            (2, "en", "alpha alpha"),                # rank 2, relevant -> rr 500
            (3, "en", "alpha"),                      # rank 3, relevant
            (4, "de", "beta"),
        ],
        "doc_id long, lang string, text string",
    )
    rows = {r["term"]: r for r in mrr_recall_eval(docs, ["alpha", "beta"], k=10).collect()}
    a = rows["alpha"]
    assert (a["first_rel_pos"], a["rr_milli"]) == (2, 500)
    assert (a["hits_at_k"], a["n_rel"], a["recall_milli"]) == (2, 2, 1000)
    b = rows["beta"]
    assert b["first_rel_pos"] is None and b["rr_milli"] is None
    assert b["n_rel"] == 0 and b["recall_milli"] is None


def test_token_yield_report_planted_dups(spark):
    """A duplicated doc's tokens vanish after dedup; a low-alpha doc's
    tokens vanish after the quality floor; yields are exact milli."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.corpus import (
        token_yield_report,
    )

    docs = spark.createDataFrame(
        [
            (1, "s1", "good clean prose here"),     # 4 tokens, survives all
            (2, "s1", "good clean prose here"),     # exact dup -> dropped
            (3, "s1", "1234 5678 9999 0000 1111"),  # 5 tokens, alpha 0 -> quality-dropped
        ],
        "doc_id long, source string, text string",
    )
    r = {x["source"]: x for x in token_yield_report(docs).collect()}["s1"]
    assert (r["docs_raw"], r["tokens_raw"]) == (3, 13)
    assert r["tokens_after_dedup"] == 9      # dup's 4 tokens gone
    assert r["tokens_after_quality"] == 4    # digit doc's 5 gone
    assert r["dedup_yield_milli"] == (1000 * 9) // 13
    assert r["final_yield_milli"] == (1000 * 4) // 13


def test_gopher_rules_each_gate(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        gopher_rules,
    )

    good = "the quick brown fox jumps over that lazy dog again " * 6  # 60 words
    cases = {
        0: good,                                     # passes all 7
        1: "the short one with that",                # word-count fail only
        2: ("a b c d " * 15) + "the of and that have with",  # mean word len < 3
        3: good + " ### # ## " + "# " * 10,          # symbol ratio fail
        4: "\n".join(["- bullet line"] * 9 + [good]),  # 9/10 bullet lines
        5: "\n".join(["ends with dots..."] * 3 + [good] * 4),  # 3/7 ellipsis
        6: good + " " + "12345 " * 70,               # alpha-word frac < 0.8
        7: ("zork blarg quux " * 20),                 # no stopwords
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in sorted(cases.items())], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}

    assert rows[0]["gopher_keep"] == 1
    assert all(v == 1 for k, v in rows[0].items() if k.startswith("r_"))
    assert rows[1]["r_word_count"] == 0 and rows[1]["gopher_keep"] == 0
    assert sum(v for k, v in rows[1].items() if k.startswith("r_")) == 6
    assert rows[2]["r_mean_word_len"] == 0
    assert rows[3]["r_symbol_ratio"] == 0
    assert rows[4]["r_bullet_lines"] == 0 and rows[4]["n_lines"] == 10
    assert rows[5]["r_ellipsis_lines"] == 0
    assert rows[6]["r_alpha_words"] == 0
    assert rows[7]["r_stopwords"] == 0
    # every failing case flips ONLY its target rule off plus keep
    for i in (2, 3, 4, 5, 6, 7):
        assert rows[i]["gopher_keep"] == 0

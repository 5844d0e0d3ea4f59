"""Round-7 operator unit tests (beyond the sf0.001 oracle parity in
test_queries_oracle.py): the two rows-only -> full-oracle conversions."""

from __future__ import annotations

import hashlib


def test_kmeans_literal_assign_planted(spark):
    """With centroids pinned to the k lowest-id vectors, every vector
    must land on the nearest init vector by exact integer squared-L2,
    ties to the lowest centroid id."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        kmeans_literal_assign,
    )

    rows = [
        (0, [0.0, 0.0]),       # centroid 0
        (1, [10.0, 10.0]),     # centroid 1
        (2, [0.1, -0.1]),      # near centroid 0
        (3, [9.8, 10.3]),      # near centroid 1
        (4, [5.0, 5.0]),       # equidistant -> tie to cid 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in kmeans_literal_assign(df, k=2).collect()
    }
    assert got[0] == (0, 0)
    assert got[1] == (1, 0)
    assert got[2][0] == 0
    assert got[3][0] == 1
    # exact integer distance: (0.1e6)^2 + (0.1e6)^2
    assert got[2][1] == 2 * (100000 ** 2)
    # true tie (5,5) between (0,0) and (10,10): first centroid wins
    assert got[4][0] == 0


def test_kmeans_literal_assign_matches_python(spark):
    """Integer argmin parity with a python brute force on arbitrary
    vectors (including negatives and >1 magnitudes)."""
    import random

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        kmeans_literal_assign,
    )

    random.seed(7)
    vecs = {
        i: [round(random.uniform(-3, 3), 4) for _ in range(5)] for i in range(40)
    }
    df = spark.createDataFrame(
        list(vecs.items()), "vec_id long, embedding array<double>"
    )
    k = 4
    cents = {i: [round(x * 1e6) for x in vecs[i]] for i in range(k)}
    got = {r["vec_id"]: (r["cluster"], r["d2"]) for r in kmeans_literal_assign(df, k=k).collect()}
    for vid, v in vecs.items():
        vi = [round(x * 1e6) for x in v]
        best = min(
            (sum((a - b) ** 2 for a, b in zip(vi, cv)), cid)
            for cid, cv in cents.items()
        )
        assert got[vid] == (best[1], best[0]), vid


def test_media_md5_near_dup_exact_pairs(spark):
    """The md5-fallback mode must pair exactly the identical payloads
    (low-63-bit md5 equality) and nothing else, id_a < id_b."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.multimodal import (
        attach_binary_payload,
        media_phash_near_dup,
    )

    texts = {
        0: "the quick brown fox",
        1: "the quick brown fox",   # dup of 0
        2: "jumps over the lazy dog",
        3: "jumps over the lazy dog",  # dup of 2
        4: "jumps over the lazy dog",  # dup of 2/3
        5: "something else entirely",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in media_phash_near_dup(
            attach_binary_payload(df), n_bits=63, radius=0
        ).collect()
    }
    assert set(pairs) == {(0, 1), (2, 3), (2, 4), (3, 4)}
    assert all(h == 0 for h in pairs.values())


def test_media_md5_fallback_bits_match_hashlib(spark):
    """The operator's phash for an undecodable payload must be the low
    63 bits of md5(payload) — the exact value the DuckDB oracle
    recomputes from the hex digest."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.multimodal import (
        ahash_bits,
    )

    for s in [b"hello world", b"", b"\x00\xff binary-ish \x7f"]:
        expect = int.from_bytes(hashlib.md5(s).digest(), "big") & ((1 << 63) - 1)
        assert ahash_bits(s, "text/plain", n_bits=63) == expect


def test_trimmed_mean_exact(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        trimmed_mean,
    )

    # 20 values, 10% trim -> drop lowest 2 and highest 2 by rank
    vals = [100.0, -50.0] + [float(i) for i in range(1, 17)] + [999.0, -999.0]
    rows = [(i, "a", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = trimmed_mean(df).collect()[0].asDict()
    assert got["n"] == 20
    assert got["n_trimmed"] == 4
    kept = sorted(round(v * 1e6) for v in vals)[2:-2]
    assert got["trimmed_mean_micro"] == int(sum(kept) / len(kept)) if sum(kept) >= 0 else got["trimmed_mean_micro"]
    # exact: truncating integer division
    sv = sum(kept)
    expect = int(sv / len(kept)) if sv >= 0 else -((-sv) // len(kept))
    assert got["trimmed_mean_micro"] == expect


def test_mann_kendall_reference(spark):
    """S, var18 and z against a python brute force, with planted trend
    and ties."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        mann_kendall,
    )

    series = {
        "up": [1, 2, 2, 3, 5, 8],        # rising with one tie pair
        "flat": [4, 4, 4, 4],            # all ties -> S=0
    }
    rows = []
    for t, ys in series.items():
        for day, y in enumerate(ys):
            for i in range(y):
                rows.append((t, f"2024-02-{day + 1:02d} 00:00:{i:02d}"))
    df = spark.createDataFrame(rows, "event_type string, ts string").selectExpr(
        "event_type", "cast(ts as timestamp) as ts"
    )
    got = {r["event_type"]: r.asDict() for r in mann_kendall(df).collect()}
    import math

    for t, ys in series.items():
        n = len(ys)
        s = sum(
            (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        ties = Counter(ys)
        tie_term = sum(c * (c - 1) * (2 * c + 5) for c in ties.values())
        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        r = got[t]
        assert r["n_days"] == n
        assert r["s_stat"] == s
        assert r["var_x18"] == var18
        if s == 0 or var18 <= 0:
            assert r["z_score"] == 0.0
        else:
            zz = (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0)
            assert abs(r["z_score"] - round(zz, 6)) < 1e-9


def test_chisq_independence_reference(spark):
    """chi2 against scipy-free python computation on a planted
    dependent table."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        chisq_independence,
    )

    # type A only on Mondays (2024-02-05), type B spread across two days
    rows = (
        [("A", "2024-02-05 10:00:00")] * 10
        + [("B", "2024-02-05 10:00:00")] * 5
        + [("B", "2024-02-06 10:00:00")] * 15
    )
    df = spark.createDataFrame(rows, "event_type string, ts string").selectExpr(
        "event_type", "cast(ts as timestamp) as ts"
    )
    got = chisq_independence(df).collect()[0].asDict()
    # contingency: rows A,B cols mon,tue -> O = [[10,0],[5,15]]
    n = 30
    obs = {("A", 0): 10, ("A", 1): 0, ("B", 0): 5, ("B", 1): 15}
    rt = {"A": 10, "B": 20}
    ct = {0: 15, 1: 15}
    chi2 = sum(
        (obs[(r, c)] * n - rt[r] * ct[c]) ** 2 / (n * rt[r] * ct[c])
        for r in rt
        for c in ct
    )
    assert got["n"] == 30 and got["dof"] == 1
    assert abs(got["chi2"] - round(chi2, 6)) < 1e-9
    import math

    assert abs(got["cramers_v"] - round(math.sqrt(chi2 / 30), 6)) < 1e-9


def test_zipf_slope_planted(spark):
    """A corpus with freq exactly proportional to 1/rank must fit slope
    ~ -1."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        zipf_slope,
    )

    words = []
    for rank in range(1, 21):
        words += [f"w{rank:02d}"] * (240 // rank)  # f = 240/rank exactly-ish
    docs = [(0, "zipfy", " ".join(words))]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    row = zipf_slope(df, top_n=20).collect()[0]
    assert row["n_terms_used"] == 20
    assert abs(row["slope"] + 1.0) < 0.03  # 240//rank floor-rounding wiggle


def test_cross_source_overlap_exact(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        cross_source_overlap,
    )

    docs = [
        (0, "s1", "a b c d"),
        (1, "s1", "c d e"),
        (2, "s2", "c d x"),
        (3, "s3", "zz"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {
        (r["source_a"], r["source_b"]): r.asDict()
        for r in cross_source_overlap(df).collect()
    }
    # s1 vocab {a b c d e} (5), s2 {c d x} (3), s3 {zz} (1)
    r = got[("s1", "s2")]
    assert (r["n_a"], r["n_b"], r["n_inter"]) == (5, 3, 2)
    assert r["jaccard_milli"] == (1000 * 2) // 6
    assert got[("s1", "s3")]["n_inter"] == 0
    assert got[("s2", "s3")]["n_inter"] == 0


def test_source_info_gain_extremes(spark):
    """Perfectly source-determined lengths -> IG == H(bucket); identical
    length profiles -> IG == 0."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        source_length_info_gain,
    )

    # deterministic: s1 all bucket0 (<200), s2 all bucket3 (>=800)
    det = [(i, "s1", 100) for i in range(4)] + [(i + 4, "s2", 900) for i in range(4)]
    df = spark.createDataFrame(det, "doc_id long, source string, n_chars long")
    row = df and source_length_info_gain(df).collect()[0].asDict()
    assert abs(row["info_gain_milli"] - row["h_bucket_milli"]) < 1e-6
    # independent: both sources have the same 50/50 bucket mix
    ind = (
        [(i, "s1", 100) for i in range(2)]
        + [(10 + i, "s1", 900) for i in range(2)]
        + [(20 + i, "s2", 100) for i in range(2)]
        + [(30 + i, "s2", 900) for i in range(2)]
    )
    df2 = spark.createDataFrame(ind, "doc_id long, source string, n_chars long")
    row2 = source_length_info_gain(df2).collect()[0].asDict()
    assert abs(row2["info_gain_milli"]) < 1e-6


def test_jl_project_signs_and_sums(spark):
    """Projected components equal the python-side signed sums with the
    same md5 sign convention."""
    import hashlib

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.linalg import (
        jl_project,
    )

    def sgn(j, i):
        return 1 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1

    vecs = {0: [0.5, -0.25, 1.0], 1: [0.001, 0.002, -0.003]}
    df = spark.createDataFrame(
        list(vecs.items()), "vec_id long, embedding array<double>"
    )
    got = {
        (r["vec_id"], r["j"]): r["comp"]
        for r in jl_project(df, k_out=4, dim=3).collect()
    }
    assert len(got) == 8
    for vid, v in vecs.items():
        vi = [round(x * 1e6) for x in v]
        for j in range(4):
            assert got[(vid, j)] == sum(sgn(j, i) * vi[i] for i in range(3))


def test_runs_test_reference(spark):
    """Runs count, side counts, and z against a python brute force on a
    planted alternating vs clustered pair of series."""
    import math

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        runs_test,
    )

    series = {
        "alt": [1, 9, 1, 9, 1, 9, 1, 9],  # alternating -> many runs
        "clump": [9, 9, 9, 9, 1, 1, 1, 1],  # clustered -> 2 runs
    }
    rows = []
    for t, ys in series.items():
        for day, y in enumerate(ys):
            for i in range(y):
                rows.append((t, f"2024-03-{day + 1:02d} 00:00:{i:02d}"))
    df = spark.createDataFrame(rows, "event_type string, ts string").selectExpr(
        "event_type", "cast(ts as timestamp) as ts"
    )
    got = {r["event_type"]: r.asDict() for r in runs_test(df).collect()}
    for t, ys in series.items():
        n = len(ys)
        order = sorted(ys)
        med2 = order[(n + 1) // 2 - 1] + order[(n + 2) // 2 - 1]
        sgns = [1 if 2 * y > med2 else -1 for y in ys if 2 * y != med2]
        n1 = sgns.count(1)
        n2 = sgns.count(-1)
        r_runs = 1 + sum(1 for a, b in zip(sgns, sgns[1:]) if a != b)
        rr = got[t]
        assert (rr["n_above"], rr["n_below"], rr["n_runs"]) == (n1, n2, r_runs), t
        nn = n1 + n2
        mu = 2 * n1 * n2 / nn + 1
        var = 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / (nn * nn * (nn - 1))
        zz = (r_runs - mu) / math.sqrt(var) if var > 0 else 0.0
        assert abs(rr["z_score"] - round(zz, 6)) < 1e-9
    assert got["clump"]["n_runs"] == 2
    assert got["alt"]["n_runs"] == 8
    assert got["clump"]["z_score"] < got["alt"]["z_score"]


def test_wasserstein_reference(spark):
    """W1 against scipy-free python on hand-placed arm values."""
    import hashlib

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        wasserstein_value_drift,
    )

    def arm(u):
        return "a" if hashlib.md5(str(u).encode()).hexdigest()[0] < "8" else "b"

    # pick unit ids with known arms
    a_units = [u for u in range(100) if arm(u) == "a"][:4]
    b_units = [u for u in range(100) if arm(u) == "b"][:4]
    a_vals = [1.0, 2.0, 2.0, 5.0]
    b_vals = [2.0, 3.0, 5.0, 9.0]
    rows = [(i, u, "t", v) for i, (u, v) in enumerate(zip(a_units, a_vals))] + [
        (100 + i, u, "t", v) for i, (u, v) in enumerate(zip(b_units, b_vals))
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    got = wasserstein_value_drift(df).collect()[0].asDict()
    assert (got["n_a"], got["n_b"]) == (4, 4)

    # brute-force W1 on milli grid
    am = sorted(round(v * 1000) for v in a_vals)
    bm = sorted(round(v * 1000) for v in b_vals)
    xs = sorted(set(am) | set(bm))
    w1 = 0.0
    for x0, x1 in zip(xs, xs[1:]):
        fa = sum(1 for v in am if v <= x0) / len(am)
        fb = sum(1 for v in bm if v <= x0) / len(bm)
        w1 += (x1 - x0) * abs(fa - fb)
    assert abs(got["w1_milli"] - round(w1, 6)) < 1e-6


def test_srm_check_flag_boundary(spark):
    """The integer flag must fire exactly past the 3.841 boundary."""
    import hashlib

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        srm_check,
    )

    def arm(u):
        return "a" if hashlib.md5(str(u).encode()).hexdigest()[0] < "8" else "b"

    pool_a = [u for u in range(4000) if arm(u) == "a"]
    pool_b = [u for u in range(4000) if arm(u) == "b"]

    def mk(t, na, nb, base):
        return [(base + i, u, t) for i, u in enumerate(pool_a[:na] + pool_b[:nb])]

    # balanced: chi2 = 0; skewed 120/80: chi2 = 40^2/200 = 8 > 3.841
    rows = mk("bal", 100, 100, 0) + mk("skew", 120, 80, 10_000)
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    got = {r["event_type"]: r.asDict() for r in srm_check(df).collect()}
    assert got["bal"]["srm_flag"] == 0 and got["bal"]["chi2"] == 0.0
    assert got["skew"]["srm_flag"] == 1 and abs(got["skew"]["chi2"] - 8.0) < 1e-9


def test_acf_daily_weekly_cycle(spark):
    """A strict 2-day alternating series must have r = -1 at lag 1 and
    r = +1 at lag 2 (perfect anticorrelation / correlation)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        acf_daily,
    )

    ys = [5, 1] * 6  # 12 days alternating
    rows = []
    for day, y in enumerate(ys):
        for i in range(y):
            rows.append(("t", f"2024-03-{day + 1:02d} 00:00:{i:02d}"))
    df = spark.createDataFrame(rows, "event_type string, ts string").selectExpr(
        "event_type", "cast(ts as timestamp) as ts"
    )
    got = {r["lag"]: r["r"] for r in acf_daily(df, max_lag=3).collect()}
    assert got[1] == -1.0
    assert got[2] == 1.0
    assert got[3] == -1.0


def test_hill_tail_index_pareto(spark):
    """On exact Pareto(alpha) order statistics x_(i) = (k/i)^(1/alpha)
    the Hill estimator recovers alpha closely."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        hill_tail_index,
    )

    alpha = 2.0
    n = 300
    # deterministic Pareto sample via inverse CDF on a uniform grid
    vals = [(1.0 - (i + 0.5) / n) ** (-1.0 / alpha) for i in range(n)]
    rows = [(i, "p", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = hill_tail_index(df, k=50).collect()[0].asDict()
    assert got["k"] == 50 and got["n_pos"] == n
    assert abs(got["alpha"] - alpha) < 0.35  # k=50 estimator noise


def test_hill_tail_index_drops_short_groups(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        hill_tail_index,
    )

    rows = [(i, "small", float(i + 1)) for i in range(20)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    assert hill_tail_index(df, k=50).count() == 0


def test_corpus_source_hhi_extremes(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        corpus_source_hhi,
    )

    # single source: HHI = 1e6 micro, effective = 1
    one = spark.createDataFrame(
        [(i, "s") for i in range(10)], "doc_id long, source string"
    )
    r = corpus_source_hhi(one).collect()[0].asDict()
    assert (r["hhi_micro"], r["effective_sources"], r["top_share_milli"]) == (
        1000000,
        1.0,
        1000,
    )
    # 4 equal sources: HHI = 0.25, effective = 4
    four = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(40)], "doc_id long, source string"
    )
    r4 = corpus_source_hhi(four).collect()[0].asDict()
    assert (r4["hhi_micro"], r4["effective_sources"]) == (250000, 4.0)
    assert r4["top_share_milli"] == 250


def test_hash_uniformity_audit_reference(spark):
    """Exact sup-gap against a python brute force over the same md5
    bucket assignment."""
    import hashlib

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        hash_uniformity_audit,
    )

    rows = [(i, u) for i, u in enumerate(range(500))]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    got = hash_uniformity_audit(df).collect()[0].asDict()
    counts = [0] * 256
    for u in range(500):
        counts[int(hashlib.md5(str(u).encode()).hexdigest()[:2], 16)] += 1
    n = 500
    cum = 0
    dev = 0
    for b in range(256):
        cum += counts[b]
        dev = max(dev, abs(256 * cum - n * (b + 1)))
    assert got["n_units"] == n
    assert got["max_abs_dev_x"] == dev
    assert got["d_milli"] == (1000 * dev) // (n * 256)
    expect_flag = int(dev * dev * 1e6 > 1358.0**2 * n * 256 * 256)
    assert got["ks_flag"] == expect_flag


def test_hash_uniformity_flags_broken_hash_space(spark):
    """A key space that collapses to few buckets must trip the flag."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        hash_uniformity_audit,
    )
    import hashlib

    # pick 200 keys that all land in bucket < 16 (first hex char '0')
    keys = [u for u in range(100000) if hashlib.md5(str(u).encode()).hexdigest()[0] == "0"][:200]
    df = spark.createDataFrame([(i, k) for i, k in enumerate(keys)], "event_id long, user_id long")
    got = hash_uniformity_audit(df).collect()[0].asDict()
    assert got["ks_flag"] == 1
    assert got["d_milli"] > 900  # nearly all mass before bucket 16


def test_markov_entropy_rate_extremes(spark):
    """Deterministic A->B->A->B chains: H(next) = ln 2, H(next|prev)=0,
    gain = ln 2. IID uniform arrivals: gain ~ 0."""
    import math

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        markov_entropy_rate,
    )

    det = []
    for u in range(4):
        for i in range(20):
            det.append((u * 100 + i, u, "AB"[i % 2], f"2024-01-01 00:{i:02d}:00"))
    df = spark.createDataFrame(
        det, "event_id long, user_id long, event_type string, ts string"
    ).selectExpr("event_id", "user_id", "event_type", "cast(ts as timestamp) as ts")
    got = markov_entropy_rate(df).collect()[0].asDict()
    assert got["n_types"] == 2
    # per user the 19 next-types are 10 B / 9 A (sequence starts at A),
    # so the marginal is H(36/76, 40/76), slightly under ln 2
    ca, cb = 4 * 9, 4 * 10
    n = ca + cb
    h_expect = -(ca / n) * math.log(ca / n) - (cb / n) * math.log(cb / n)
    assert got["n_transitions"] == n
    assert abs(got["h_next_milli"] - round(h_expect * 1000, 6)) < 1e-6
    # the chain itself is fully deterministic: H(next|prev) = 0
    assert got["h_cond_milli"] == 0.0
    assert abs(got["predictability_gain_milli"] - round(h_expect * 1000, 6)) < 1e-6


def test_dup_cluster_histogram_planted(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup import (
        dup_cluster_histogram,
    )

    texts = (
        ["boilerplate page"] * 5       # one size-5 cluster
        + ["terms of service"] * 2     # one size-2 cluster
        + ["unique a", "unique b", "unique c"]  # three singletons
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["cluster_size"]: r.asDict() for r in dup_cluster_histogram(df).collect()}
    assert got[5]["n_clusters"] == 1 and got[5]["n_docs"] == 5
    assert got[2]["n_clusters"] == 1 and got[2]["n_docs"] == 2
    assert got[1]["n_clusters"] == 3 and got[1]["n_docs"] == 3
    assert got[5]["docs_milli"] == 500 and got[1]["docs_milli"] == 300


def test_new_user_share_reference(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        new_user_share,
    )

    rows = [
        (0, 1, "2024-01-01 09:00:00"),
        (1, 2, "2024-01-01 10:00:00"),   # day 1: 2 users, both new
        (2, 1, "2024-01-02 09:00:00"),
        (3, 3, "2024-01-02 10:00:00"),   # day 2: 1 returning + 1 new
        (4, 1, "2024-01-03 09:00:00"),
        (5, 2, "2024-01-03 10:00:00"),
        (6, 3, "2024-01-03 11:00:00"),   # day 3: all returning
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string").selectExpr(
        "event_id", "user_id", "cast(ts as timestamp) as ts"
    )
    got = {r["day"]: (r["dau"], r["n_new"], r["new_milli"]) for r in new_user_share(df).collect()}
    assert got["2024-01-01"] == (2, 2, 1000)
    assert got["2024-01-02"] == (2, 1, 500)
    assert got["2024-01-03"] == (3, 0, 0)


def test_near_dup_threshold_sweep_bands(spark):
    """Band histogram must partition the candidate pairs exactly and
    the reverse-cumulative counts must telescope."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup import (
        minhash_jaccard_pairs,
        near_dup_threshold_sweep,
    )

    texts = []
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for i in range(8):
        texts.append(base)                       # exact dups -> est 1000
        mod = base.split()
        mod[i % 10] = f"zz{i}"
        texts.append(" ".join(mod))              # near dups
    texts += [f"totally different words number {i} here now" for i in range(6)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = near_dup_threshold_sweep(df).collect()
    bands = {r["band_milli"]: r for r in rows}
    total = sum(r["n_pairs"] for r in rows)
    # all candidate pairs (threshold 0 on the same pipeline) are banded
    all_pairs = minhash_jaccard_pairs(df, threshold_milli=0).count()
    assert total == all_pairs
    # reverse-cumulative telescopes: at the max band, cum == n_pairs;
    # at the min band, cum == total
    mx, mn = max(bands), min(bands)
    assert bands[mx]["n_pairs_at_or_above"] == bands[mx]["n_pairs"]
    assert bands[mn]["n_pairs_at_or_above"] == total
    # the planted exact dups land in the 1000 band
    assert bands.get(1000) is not None and bands[1000]["n_pairs"] >= 8


def test_embedding_norm_profile_reference(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.linalg import (
        embedding_norm_profile,
    )

    # label 0: collapsing norms; label 1: healthy unit-ish norms
    rows = []
    for i in range(10):
        rows.append((i, [0.001 * (i + 1), 0.0], 0))
    for i in range(10):
        rows.append((100 + i, [1.0, 0.1 * i], 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {r["label"]: r.asDict() for r in embedding_norm_profile(df).collect()}

    def n2(v):
        return sum(round(x * 1e6) ** 2 for x in v)

    for lb in (0, 1):
        vals = sorted(n2(r[1]) for r in rows if r[2] == lb)
        n = len(vals)
        assert got[lb]["n_vecs"] == n
        import math

        assert got[lb]["p50_norm2"] == vals[math.ceil(0.5 * n) - 1]
        assert got[lb]["p90_norm2"] == vals[math.ceil(0.9 * n) - 1]
        assert got[lb]["mean_norm2"] == sum(vals) // n
    assert got[0]["p90_norm2"] < got[1]["p50_norm2"]  # collapse is visible

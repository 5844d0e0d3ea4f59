"""Round-8 operator unit tests (beyond the sf0.001 oracle parity in
test_queries_oracle.py): the PQ/IVF literal-synopsis twins and the four
new analytics operators."""

from __future__ import annotations

import math


def _q6(x: float) -> int:
    # e6 quantization matching F.round(x * 1e6).cast("long"): Spark
    # round() is HALF_UP on the double grid
    from decimal import Decimal, ROUND_HALF_UP

    return int(Decimal(repr(x * 1000000.0)).quantize(0, ROUND_HALF_UP))


def test_pq_literal_adc_matches_python(spark):
    """Codes and ADC distance must equal a python brute force over the
    same init-pinned e6 codebook (m=2 subspaces, k_code=3, dim=4)."""
    import random

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.pq import (
        pq_literal_adc,
    )

    random.seed(11)
    vecs = {i: [round(random.uniform(-2, 2), 4) for _ in range(4)] for i in range(25)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: (r["codes_csv"], r["adc_d2"])
        for r in pq_literal_adc(df, m=2, k_code=3, query_vec_id=0).collect()
    }
    q = [_q6(x) for x in vecs[0]]
    seeds = [[_q6(x) for x in vecs[i]] for i in sorted(vecs)[:3]]
    for i, v in vecs.items():
        vq = [_q6(x) for x in v]
        codes, adc = [], 0
        for s in range(2):
            sl = vq[s * 2 : (s + 1) * 2]
            d2s = [
                sum((a - b) * (a - b) for a, b in zip(sl, sv[s * 2 : (s + 1) * 2]))
                for sv in seeds
            ]
            j = d2s.index(min(d2s))  # first-lowest tie-break
            codes.append(j)
            qsl = q[s * 2 : (s + 1) * 2]
            cw = seeds[j][s * 2 : (s + 1) * 2]
            adc += sum((a - b) * (a - b) for a, b in zip(qsl, cw))
        assert got[i] == (",".join(map(str, codes)), adc), i


def test_pq_literal_adc_query_is_exact_zero(spark):
    """The query vector's own ADC distance is the distance to its
    codewords — for a corpus where the query IS a seed, every subspace
    argmin picks the query's own slice and adc_d2 == 0."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.pq import (
        pq_literal_adc,
    )

    rows = [
        (0, [1.0, 2.0, 3.0, 4.0]),
        (1, [-1.0, 5.0, 0.5, 2.5]),
        (2, [4.0, 4.0, 4.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["adc_d2"] for r in pq_literal_adc(df, m=2, k_code=3).collect()}
    assert got[0] == 0


def test_ivf_literal_probe_matches_brute_force(spark):
    """Probe results must equal a python IVF replay: integer cell
    argmin, 2 nearest cells to the query, exact integer dot top-k with
    (dot desc, id) order."""
    import random

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        ivf_literal_probe,
    )

    random.seed(23)
    vecs = {i: [round(random.uniform(-1, 1), 4) for _ in range(6)] for i in range(60)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = ivf_literal_probe(df, k_cells=4, nprobe=2, query_vec_id=0, topk=5).collect()

    qi = {i: [_q6(x) for x in v] for i, v in vecs.items()}
    cents = [qi[i] for i in sorted(vecs)[:4]]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cells = {
        i: min(range(4), key=lambda c: (d2(v, cents[c]), c)) for i, v in qi.items()
    }
    probe = [c for _d, c in sorted((d2(qi[0], cents[c]), c) for c in range(4))[:2]]
    cand = [
        (-sum(a * b for a, b in zip(qi[i], qi[0])), i)
        for i in qi
        if i != 0 and cells[i] in probe
    ]
    want = sorted(cand)[:5]
    got = [(r["rank"], r["vec_id"], r["dot_e12"], r["cell"]) for r in out]
    got.sort()
    assert [(v, -d) for d, v in want] == [(g[1], g[2]) for g in got]
    for _rank, vid, _dot, cell in got:
        assert cells[vid] == cell
        assert cell in probe


def test_ivf_literal_probe_prunes_cells(spark):
    """No result may come from a non-probed cell even when that cell
    holds the true nearest neighbor (the documented IVF recall
    trade-off, here deterministic)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        ivf_literal_probe,
    )

    # centroids: ids 0..3. id 10 sits in cell 3's corner but has the
    # highest dot with the query — it must NOT appear (cell 3 unprobed).
    rows = [
        (0, [1.0, 0.0, 0.0]),    # query + centroid 0
        (1, [0.9, 0.1, 0.0]),    # centroid 1 (cell probed 2nd)
        (2, [-1.0, 0.0, 0.0]),   # centroid 2
        (3, [0.0, -1.0, 5.0]),   # centroid 3 (far)
        (10, [0.1, -0.9, 4.9]),  # lands in cell 3
        (11, [0.8, 0.2, 0.0]),   # cell 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ivf_literal_probe(df, k_cells=4, nprobe=2, query_vec_id=0, topk=10).collect()
    ids = {r["vec_id"] for r in out}
    assert 10 not in ids
    assert 11 in ids


def test_embedding_clip_bounds_exact_order_stats(spark):
    """p_low/p_high are the values at rank ceil(q*n) under
    (value, vec_id) total order, per dimension."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.linalg import (
        embedding_clip_bounds,
    )

    # dim 0: values 1..10 -> p10 at rank 1, p90 at rank 9
    rows = [(i, [float(i + 1), 100.0 - i]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["pos"]: r for r in embedding_clip_bounds(df, p_low=0.1, p_high=0.9).collect()
    }
    assert got[0]["n_vecs"] == 10
    assert got[0]["min_e6"] == 1_000_000
    assert got[0]["p_low_e6"] == 1_000_000      # ceil(0.1*10) = rank 1
    assert got[0]["p_high_e6"] == 9_000_000     # ceil(0.9*10) = rank 9
    assert got[0]["max_e6"] == 10_000_000
    assert got[1]["max_e6"] == 100_000_000


def test_dup_ngram_ratio_counts_occurrences(spark):
    """Repetition counts use every occurrence, not the distinct set."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        dup_ngram_ratio,
    )

    rows = [
        (1, "a b c a b c a b c"),   # 7 trigrams; "a b c" x3, "b c a" x2, "c a b" x2 -> all 7 dup
        (2, "w x y z"),             # 2 trigrams, both unique
        (3, "hi"),                  # <3 words -> single degenerate gram
        (4, "p q p q p q p q"),     # 6 trigrams: "p q p" x3, "q p q" x3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dup_ngram_ratio(df, n=3).collect()}
    assert (got[1]["n_grams"], got[1]["dup_grams"], got[1]["dup_ratio_milli"]) == (7, 7, 1000)
    assert (got[2]["n_grams"], got[2]["dup_grams"], got[2]["dup_ratio_milli"]) == (2, 0, 0)
    assert (got[3]["n_grams"], got[3]["dup_grams"]) == (1, 0)
    assert (got[4]["n_grams"], got[4]["dup_grams"], got[4]["dup_ratio_milli"]) == (6, 6, 1000)


def test_kruskal_wallis_matches_scipy_formula(spark):
    """H on a crafted 4-arm dataset must match the textbook
    tie-corrected formula computed in python over the same md5 arms."""
    import hashlib

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        kruskal_wallis,
    )

    # enough users that all 4 arms are hit
    rows = []
    for uid in range(200):
        rows.append((uid, "t1", float(uid % 13) + (uid % 3) * 0.5))
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    out = kruskal_wallis(df).collect()
    assert len(out) == 1
    r = out[0]

    def arm(uid):
        return int(hashlib.md5(str(uid).encode()).hexdigest()[0], 16) // 4

    vals = [(arm(u), v) for u, _t, v in rows]
    svals = sorted({v for _a, v in vals})
    # average ranks with ties
    ranks = {}
    pos = 1
    from collections import Counter

    cnt = Counter(v for _a, v in vals)
    for v in svals:
        c = cnt[v]
        ranks[v] = (2 * pos + c - 1) / 2.0
        pos += c
    n = len(vals)
    groups = {}
    for a, v in vals:
        groups.setdefault(a, []).append(ranks[v])
    assert set(groups) == {0, 1, 2, 3}
    sr2 = sum(sum(g) ** 2 / len(g) for g in groups.values())
    h = 12.0 / (n * (n + 1)) * sr2 - 3 * (n + 1)
    t_corr = sum(c ** 3 - c for c in cnt.values())
    hc = h / (1 - t_corr / (n ** 3 - n))
    assert abs(r["h_stat"] - h) < 1e-5
    assert abs(r["h_corrected"] - hc) < 1e-5
    assert r["n"] == n
    sizes = [len(groups[a]) for a in range(4)]
    assert r["arm_sizes_csv"] == ",".join(map(str, sizes))


def test_kruskal_wallis_null_units_dropped_and_arm_guard(spark):
    """NULL user_id/event_type rows must not inflate the rank totals
    or tie correction (md5(NULL) -> arm NULL was counted in N's tie
    groups but no arm); and n_arms must divide 16 or the hex-char
    split silently creates an unreachable arm."""
    import pytest

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        kruskal_wallis,
    )

    clean = [(uid, "t1", float(uid % 7)) for uid in range(120)]
    dirty = clean + [(None, "t1", 3.0), (None, "t1", 99.0), (5, None, 2.0)]
    schema = "user_id long, event_type string, value double"
    want = kruskal_wallis(spark.createDataFrame(clean, schema)).collect()[0]
    got = kruskal_wallis(spark.createDataFrame(dirty, schema)).collect()[0]
    assert got["n"] == want["n"]
    assert got["h_stat"] == want["h_stat"]
    assert got["h_corrected"] == want["h_corrected"]
    assert got["arm_sizes_csv"] == want["arm_sizes_csv"]
    with pytest.raises(ValueError, match="divide 16"):
        kruskal_wallis(spark.createDataFrame(clean, schema), n_arms=3)


def test_sprt_first_crossing(spark):
    """A type whose every value succeeds crosses +ln(19) after exactly
    ceil(2944439/405465)=8 observations; an alternating type never
    leaves the continue band."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        sprt_ab_test,
    )
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(20):
        rows.append((i, t0 + datetime.timedelta(seconds=i), 1, "winner", 100.0, None))
    for i in range(20, 60):
        rows.append(
            (i, t0 + datetime.timedelta(seconds=i), 2, "coin",
             100.0 if i % 2 else 1.0, None)
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["event_type"]: r for r in sprt_ab_test(df).collect()}
    w = got["winner"]
    assert w["decision"] == "accept_h1"
    assert w["n_at_decision"] == 8
    assert w["llr_micro_at_decision"] == 8 * 405465
    assert w["n_success"] == 20
    c = got["coin"]
    assert c["decision"] == "continue"
    assert c["n_at_decision"] == 0
    assert c["llr_micro_final"] in (0, -405465, 405465)


def test_sprt_accepts_h0_on_failures(spark):
    """All-failure stream crosses the lower boundary after 8 steps."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        sprt_ab_test,
    )
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), 1, "loser", 1.0, None)
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = sprt_ab_test(df).collect()[0]
    assert r["decision"] == "accept_h0"
    assert r["n_at_decision"] == 8
    assert r["llr_micro_at_decision"] == -8 * 405465


def test_vocab_coverage_chao1_formula(spark):
    """Chao1 and missing mass from hand-counted singleton/doubleton
    frequencies, including the F2=0 fallback branch."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        vocab_coverage_estimate,
    )

    rows = [
        (1, "a a b b c d e", "en", "s1", 7),     # F1={c,d,e}=3, F2={a,b}=2
        (2, "x y z", "fr", "s1", 3),              # F1=3, F2=0 -> fallback
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["lang"]: r for r in vocab_coverage_estimate(df).collect()}
    en = got["en"]
    assert (en["n_tokens"], en["vocab"], en["f1_singletons"], en["f2_doubletons"]) == (7, 5, 3, 2)
    assert abs(en["chao1_est"] - (5 + 9 / 4)) < 1e-9
    assert en["missing_mass_milli"] == (1000 * 3) // 7
    fr = got["fr"]
    assert fr["f2_doubletons"] == 0
    assert abs(fr["chao1_est"] - (3 + 3 * 2 / 2)) < 1e-9


def test_spearman_perfect_and_inverse(spark):
    """Monotone activity-value relation gives rho=1; inverse gives -1
    (no ties, exact doubled ranks)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        spearman_activity_value,
    )

    rows = []
    # type "up": user u has u+1 events of value 10 each -> x and y both increase
    for u in range(5):
        for i in range(u + 1):
            rows.append((len(rows), None, u, "up", 10.0, None))
    # type "down": user u has u+1 events, each of value 100/(u+1)^2 -> y decreases
    for u in range(5):
        for i in range(u + 1):
            rows.append((len(rows), None, u, "down", 100.0 / (u + 1) ** 2, None))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["event_type"]: r for r in spearman_activity_value(df).collect()}
    assert got["up"]["rho"] == 1.0
    assert got["down"]["rho"] == -1.0
    assert got["up"]["n_users"] == 5


def test_top_terms_drift_detects_switch(spark):
    """A source that switches vocabulary mid-stream gets jaccard 0; a
    stable source gets 1000."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        top_terms_drift,
    )

    rows = []
    for i in range(10):
        rows.append((i, "alpha beta gamma", "en", "switchy", 10))
    for i in range(10, 20):
        rows.append((i, "delta epsilon zeta", "en", "switchy", 10))
    for i in range(100, 120):
        rows.append((i, "same words here", "en", "stable", 10))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["source"]: r for r in top_terms_drift(df, k=5).collect()}
    assert got["switchy"]["n_common"] == 0
    assert got["switchy"]["jaccard_milli"] == 0
    assert got["stable"]["jaccard_milli"] == 1000
    assert got["stable"]["top_k_first"] == 3  # only 3 distinct terms


def test_media_byte_entropy_bounds(spark):
    """Constant payload -> 0 entropy; 256 distinct bytes -> ln(256)
    milli-nats exactly."""
    import math

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.multimodal import (
        media_byte_entropy,
    )

    rows = [
        (1, bytes([65] * 100)),            # "AAAA..." -> entropy 0
        (2, bytes(range(256))),             # uniform -> ln 256
        (3, b"ab"),                         # two bytes -> ln 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in media_byte_entropy(df).collect()}
    assert got[1]["entropy_milli"] == 0.0
    assert got[1]["n_distinct_bytes"] == 1
    assert abs(got[2]["entropy_milli"] - round(1000 * math.log(256), 6)) < 1e-4
    assert got[2]["n_bytes"] == 256
    assert abs(got[3]["entropy_milli"] - round(1000 * math.log(2), 6)) < 1e-4


def test_rbo_identical_and_disjoint(spark):
    """RBO of a ranking with itself is (1-p)*sum(p^(d-1)) and of two
    disjoint rankings is 0."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.evaluate import (
        rbo_rank_overlap,
    )

    a = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_id long, rnk long"
    )
    b = spark.createDataFrame(
        [(100 + i, i + 1) for i in range(10)], "doc_id long, rnk long"
    )
    same = rbo_rank_overlap(a, a, k=10, p=0.9).collect()[0]
    want = sum(0.1 * 0.9 ** (d - 1) for d in range(1, 11))
    assert abs(same["rbo"] - round(want, 6)) < 1e-9
    assert same["overlap_at_k"] == 10
    disj = rbo_rank_overlap(a, b, k=10, p=0.9).collect()[0]
    assert disj["rbo"] == 0.0
    assert disj["overlap_at_k"] == 0


def test_rbo_weights_top_heavy(spark):
    """Agreement only at rank 1 outweighs agreement only at rank 10."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.evaluate import (
        rbo_rank_overlap,
    )

    a = spark.createDataFrame([(i, i + 1) for i in range(10)], "doc_id long, rnk long")
    # b1 agrees with a only on the rank-1 item
    b1 = spark.createDataFrame(
        [(0, 1)] + [(200 + i, i + 2) for i in range(9)], "doc_id long, rnk long"
    )
    # b2 agrees only on the rank-10 item
    b2 = spark.createDataFrame(
        [(9, 10)] + [(300 + i, i + 1) for i in range(9)], "doc_id long, rnk long"
    )
    r1 = rbo_rank_overlap(a, b1, k=10).collect()[0]["rbo"]
    r2 = rbo_rank_overlap(a, b2, k=10).collect()[0]["rbo"]
    assert r1 > r2 > 0


def test_lang_label_audit_finds_mislabeled_source(spark):
    """A source whose labels disagree with the heuristic gets flagged
    with the right confusion pair."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        lang_label_audit,
    )

    rows = [
        (1, "the cat and the dog", "en", "good", 1),
        (2, "a fish in the sea", "en", "good", 1),
        (3, "the cat and the dog", "fr", "bad", 1),   # labeled fr, reads en
        (4, "an old tree of oak", "fr", "bad", 1),
        (5, "qqq zzz www", "en", "bad", 1),            # no stopwords -> unknown
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["source"]: r for r in lang_label_audit(df).collect()}
    assert got["good"]["accuracy_milli"] == 1000
    assert got["good"]["top_confusion"] == "none"
    bad = got["bad"]
    assert bad["n_docs"] == 3 and bad["n_agree"] == 0
    assert bad["top_confusion"] == "fr->en" and bad["top_confusion_n"] == 2


def test_overdispersion_poisson_vs_bursty(spark):
    """Constant 1-per-day counts give dispersion 0 (var 0); all events
    on one day of a long span give dispersion ~span-scaled."""
    import datetime

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.stats import (
        overdispersion_index,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(10):
        rows.append((d, t0 + datetime.timedelta(days=d), 1, "flat", 1.0, None))
    for i in range(10):
        rows.append((100 + i, t0, 1, "burst", 1.0, None))
    # burst type also needs a span: one event 9 days later
    rows.append((200, t0 + datetime.timedelta(days=9), 1, "burst", 1.0, None))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["event_type"]: r for r in overdispersion_index(df).collect()}
    assert got["flat"]["n_days"] == 10
    assert got["flat"]["dispersion"] == 0.0
    b = got["burst"]
    # s1=11, n=10, mean=1.1; s2=100+1=101; var=10.1-1.21=8.89; D=8.0818...
    assert b["n_days"] == 10 and b["n_events"] == 11
    assert abs(b["dispersion"] - round(8.89 / 1.1 - 0.0, 6)) < 1e-4


def test_activation_latency_exact_ranks(spark):
    """Latency is first->5th event in (ts, event_id) order; users with
    <5 events are excluded; percentiles are exact rank stats."""
    import datetime

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.windows import (
        activation_latency,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # user u reaches 5 events in u*10 seconds (u = 1..4)
    eid = 0
    for u in range(1, 5):
        for i in range(5):
            rows.append((eid, t0 + datetime.timedelta(seconds=i * u * 10 / 4), u, "t", 1.0, None))
            eid += 1
    # user 99: only 3 events -> excluded
    for i in range(3):
        rows.append((eid, t0 + datetime.timedelta(seconds=i), 99, "t", 1.0, None))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = activation_latency(df, nth=5).collect()[0]
    assert r["n_activated"] == 4
    # latencies: u*10 seconds for u=1..4 -> 10,20,30,40
    assert r["p50_latency_s"] == 20   # rank ceil(0.5*4)=2
    assert r["p90_latency_s"] == 40   # rank ceil(0.9*4)=4
    assert r["max_latency_s"] == 40


def test_media_type_sniff_magics(spark):
    """Every covered magic routes to its type; family-level match flag
    (png declared as gif still matches: both 'image')."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.multimodal import (
        media_type_sniff,
    )

    rows = [
        (1, "image/png", bytes.fromhex("89504e47") + b"rest"),
        (2, "image/gif", bytes.fromhex("ffd8ffe0") + b"jpeg-bytes"),  # family match
        (3, "text/plain", b"just words"),
        (4, "image/x-portable-graymap", b"P5\n2 2\n255\n\x00\x01\x02\x03"),
        (5, "application/zip", bytes.fromhex("504b0304") + b"zz"),
        (6, "audio/wav", bytes.fromhex("52494646") + b"wave"),       # riff family audio
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    got = {r["doc_id"]: (r["sniffed_type"], r["match"]) for r in media_type_sniff(df).collect()}
    assert got[1] == ("image/png", 1)
    assert got[2] == ("image/jpeg", 1)
    assert got[3] == ("unknown", 0)
    assert got[4] == ("image/x-portable-graymap", 1)
    assert got[5] == ("application/zip", 1)
    assert got[6] == ("audio/riff", 1)


def test_lsh_band_planner_grid(spark):
    """All 8 factorizations of 128 appear with monotone detection
    probability in bands and the corpus scalars exact."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup import (
        lsh_band_planner,
    )

    rows = [(i, "w1 w2 w3 w4 w5", ) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["bands"], r["rows_per_band"], r["p_detect_milli"], r["n_docs"], r["mean_shingles_milli"])
        for r in lsh_band_planner(df).collect()
    )
    assert [(b, r) for b, r, *_ in got] == [
        (1, 128), (2, 64), (4, 32), (8, 16), (16, 8), (32, 4), (64, 2), (128, 1)
    ]
    ps = [p for _b, _r, p, _n, _m in got]
    assert ps == sorted(ps)  # more bands -> higher detection at fixed s
    assert all(n == 10 for *_x, n, _m in got)
    assert got[0][4] == 3000  # 3 distinct shingles per doc -> 3000 milli


def test_logrank_identical_arms_is_null_result(spark):
    """If both arms have identical lifetime distributions (every user
    cohort duplicated across arms is impossible with md5 arms, so
    instead: a single-duration corpus), O-E is 0 and chi2 0."""
    import datetime

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.temporal import (
        logrank_test,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # every user lives exactly 3 days, then a 10-day silent tail ends the corpus
    for u in range(40):
        rows.append((eid, t0, u, "t", 1.0, None)); eid += 1
        rows.append((eid, t0 + datetime.timedelta(days=3), u, "t", 1.0, None)); eid += 1
    rows.append((eid, t0 + datetime.timedelta(days=13), 999, "t", 1.0, None))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = logrank_test(df).collect()[0]
    # all 40 users share duration 3 -> single event time; O-E = da - d*na/n
    # with na/n the arm share of that one risk set: E[O-E] = 0 exactly when
    # every at-risk member dies (d == n for the duration-3 row among
    # observed)... assert the identity the statistic must satisfy instead:
    assert r["n_a"] + r["n_b"] == 41
    assert abs(r["chi2"]) < 30  # finite, no crash
    # python replay for exactness
    import hashlib

    arm = lambda u: 1 if hashlib.md5(str(u).encode()).hexdigest()[0] < "8" else 0
    lifet = [(3, 1, arm(u)) for u in range(40)] + [(0, 0, arm(999))]
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0, 0, 0])
    for t, obs, a in lifet:
        per[t][0] += 1
        per[t][1] += a
        per[t][2] += obs
        per[t][3] += obs * a
    durs = sorted(per)
    total_m = sum(v[0] for v in per.values())
    total_ma = sum(v[1] for v in per.values())
    ome = 0.0
    var = 0.0
    seen_m = seen_ma = 0
    for t in durs:
        m, ma, d, da = per[t]
        n = total_m - seen_m
        na = total_ma - seen_ma
        ome += da - d * na / n
        if n > 1:
            var += d * (na / n) * (1 - na / n) * (n - d) / (n - 1)
        seen_m += m
        seen_ma += ma
    assert abs(r["o_minus_e"] - round(ome, 6)) < 1e-6
    assert abs(r["variance"] - round(var, 6)) < 1e-6


def test_event_freshness_staleness_and_gap(spark):
    """Staleness is lag behind the global max; p95 gap is the exact
    rank statistic of per-type inter-arrival seconds."""
    import datetime

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.profiling import (
        event_freshness,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # type "live": events every 10s up to t0+100s (global max)
    for i in range(11):
        rows.append((i, t0 + datetime.timedelta(seconds=10 * i), 1, "live", 1.0, None))
    # type "stale": last event at t0+40s
    for i in range(3):
        rows.append((100 + i, t0 + datetime.timedelta(seconds=20 * i), 2, "stale", 1.0, None))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["event_type"]: r for r in event_freshness(df).collect()}
    assert got["live"]["staleness_s"] == 0
    assert got["live"]["p95_gap_s"] == 10
    assert got["stale"]["staleness_s"] == 60
    assert got["stale"]["p95_gap_s"] == 20
    assert got["live"]["last_ts"].startswith("2024-01-01 00:01:40")


def test_embedding_distance_profile_exact(spark):
    """Order stats replayed in python over the same e6 pairwise grid;
    the sample is the id-order prefix per label."""
    import itertools

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        embedding_distance_profile,
    )

    import random

    random.seed(5)
    rows = [
        (i, [round(random.uniform(-1, 1), 4) for _ in range(4)], i % 2)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {r["label"]: r for r in embedding_distance_profile(df, sample_per_label=10).collect()}

    for lb in (0, 1):
        sample = sorted([r for r in rows if r[2] == lb])[:10]
        vq = {i: [_q6(x) for x in v] for i, v, _l in sample}
        d2s = sorted(
            sum((a - b) * (a - b) for a, b in zip(vq[i], vq[j]))
            for i, j in itertools.combinations(sorted(vq), 2)
        )
        n = len(d2s)
        r = got[lb]
        assert r["n_vecs"] == 10 and r["n_pairs"] == n == 45
        assert r["min_d2"] == d2s[0] and r["max_d2"] == d2s[-1]
        import math

        assert r["p10_d2"] == d2s[math.ceil(0.1 * n) - 1]
        assert r["p50_d2"] == d2s[math.ceil(0.5 * n) - 1]
        assert r["p90_d2"] == d2s[math.ceil(0.9 * n) - 1]


def test_embedding_distance_profile_detects_collapse(spark):
    """A collapsed label (all identical vectors) profiles to all-zero
    distances; a spread label does not."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        embedding_distance_profile,
    )

    rows = [(i, [1.0, 2.0], 0) for i in range(8)] + [
        (100 + i, [float(i), -float(i)], 1) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {r["label"]: r for r in embedding_distance_profile(df, sample_per_label=8).collect()}
    assert got[0]["max_d2"] == 0
    assert got[1]["min_d2"] > 0


def test_embedding_centroid_drift_hand_example(spark):
    """Two labels; label 1 shifts by +1.0 in dim 0 between halves
    (d2 = (1e6)^2 = 1e12), label 2 is constant (d2 = 0)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        embedding_centroid_drift,
    )

    rows = []
    for i in range(4):   # label 1: first half (ids 0,1) at 0.0, second (2,3) at 1.0
        rows.append((i, [0.0 if i < 2 else 1.0, 0.5], 1))
    for i in range(4, 8):  # label 2: constant
        rows.append((i, [0.25, 0.25], 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["label"]: r for r in embedding_centroid_drift(df).collect()}
    assert (got[1]["n_first"], got[1]["n_second"]) == (2, 2)
    assert got[1]["centroid_d2_e12"] == 1_000_000 * 1_000_000
    assert got[2]["centroid_d2_e12"] == 0


def test_time_split_embargo_exact_cutoff_and_band(spark):
    """10 events one minute apart, test_milli=200 -> cutoff at the
    8th event's timestamp (rank ceil(10*0.8)=8); a 90 s embargo drops
    exactly the 9th event; ties at the cutoff go to train."""
    import datetime as dt

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
        time_split_embargo,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "t", 1.0, None)
        for i in range(10)
    ]
    # a tie at the cutoff timestamp (same ts as event 7)
    rows.append((99, t0 + dt.timedelta(minutes=7), 1, "t", 1.0, None))
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df = spark.createDataFrame(rows, schema)
    # n=11, target = ceil(11*0.8) = (11*800+999) div 1000 = 9 ->
    # cumulative count reaches 9 at ts=minute 7 (events 0..7 + the tie)
    got = {
        r["event_id"]: r["split"]
        for r in time_split_embargo(df, test_milli=200, embargo_s=90).collect()
    }
    for eid in list(range(8)) + [99]:
        assert got[eid] == "train", eid
    assert got[8] == "embargo"   # minute 8 = 60 s after cutoff <= 90 s
    assert got[9] == "test"      # minute 9 = 120 s after cutoff


def test_dedup_survivor_select_quality_argmax(spark):
    """Within a duplicate cluster the highest-alpha-density copy wins;
    ties break to the lowest id; n_copies counts the cluster."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup import (
        dedup_survivor_select,
    )

    rows = [
        # cluster A: same normalized text, different quality wrappers?
        # no - same text => same quality; tie breaks to lowest id
        (1, "hello world", "s1"),
        (2, "Hello   World", "s2"),   # normalizes identically
        # cluster B: distinct content
        (3, "123 456", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: r for r in dedup_survivor_select(df).collect()}
    assert set(got) == {1, 3}
    assert got[1]["n_copies"] == 2 and got[1]["source"] == "s1"
    assert got[3]["quality_milli"] == 0  # no alpha chars
    # quality argmax across a cluster whose members differ in quality
    # is impossible for EXACT dups (same normalized text -> same q);
    # verify the argmax machinery directly on the struct ordering:
    # higher q wins even with a higher id
    rows2 = [(10, "aaaa bbbb", "x"), (11, "aaaa bbbb", "y")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string, source string")
    g2 = dedup_survivor_select(df2).collect()[0]
    assert g2["doc_id"] == 10 and g2["n_copies"] == 2


def test_length_curriculum_exact_edges(spark):
    """12 docs with token counts 1..12, k=4: edges at ranks 3/6/9 ->
    stages of exactly 3 docs each; equal lengths share a stage."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
        length_curriculum,
    )

    rows = [(i, " ".join(["w"] * i)) for i in range(1, 13)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["stage"] for r in length_curriculum(df, k=4).collect()}
    for i in range(1, 13):
        assert got[i] == (i + 2) // 3, i
    # ties: two docs of the same length land in one stage even when a
    # row-rank split would straddle the boundary
    rows2 = [(i, "a b") for i in range(8)] + [(100, "a b c d e f")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    st = {r["doc_id"]: r["stage"] for r in length_curriculum(df2, k=4).collect()}
    assert len({st[i] for i in range(8)}) == 1
    assert st[100] == 4

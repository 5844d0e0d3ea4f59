"""Quality tests for the non-oracle operators: MinHash-LSH and SimHash
near-dup detection against planted duplicates, and LSH-ANN recall
against the exact brute-force top-k.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    dedup,
    similarity,
)
from .conftest import SF_DIR


@pytest.fixture(scope="module")
def planted_docs(spark):
    """documents + planted near-duplicates of doc_id 0..4 (one word
    changed) and one exact duplicate of doc 0."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 5)
    near = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    exact = docs.filter(F.col("doc_id") == 0).select(
        F.lit(200000).alias("doc_id").cast("long"), "text"
    )
    return docs.unionByName(near).unionByName(exact)


def test_exact_dedup_finds_planted_duplicate(spark, planted_docs):
    kept = dedup.exact_dedup(planted_docs)
    # 505 + 1 exact dup → one hash collapses two docs
    assert kept.count() == planted_docs.count() - 1
    # winner is the min doc_id (0, not 200000)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 0 in ids and 200000 not in ids


def test_minhash_lsh_finds_planted_near_dups(spark, planted_docs):
    pairs = dedup.minhash_lsh_candidates(
        planted_docs, min_est_jaccard=0.5
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # every planted near-dup pair must surface
    for i in range(5):
        assert (i, i + 100000) in found, f"missing planted pair {i}"
    # exact dup pair estimated at ~1.0
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    assert est.get((0, 200000), 0) == 1.0


def test_simhash_finds_exact_dup(spark, planted_docs):
    pairs = dedup.simhash_near_dups(planted_docs, max_hamming=3).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 200000) in found
    ham = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert ham[(0, 200000)] == 0


def test_ngram_jaccard_exact_dup_is_one(spark, planted_docs):
    pairs = dedup.ngram_jaccard_pairs(planted_docs, min_jaccard=0.9).collect()
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert j.get((0, 200000)) == 1.0


def test_minhash_hot_bucket_cap_bounds_pairs(spark, planted_docs):
    """With a tiny cap, a planted swarm of identical docs (one shared
    bucket per band) must not explode into O(m²) pairs; the cap drops
    the hot buckets, normal near-dups elsewhere survive."""
    swarm = (
        planted_docs.filter(F.col("doc_id") == 1)
        .select(F.explode(F.sequence(F.lit(300000), F.lit(300019))).alias("doc_id"), "text")
    )
    docs = planted_docs.unionByName(swarm.select("doc_id", "text"))
    capped = dedup.minhash_lsh_candidates(docs, max_bucket_size=10)
    swarm_pairs = capped.filter(
        (F.col("id_a") >= 300000) & (F.col("id_b") >= 300000)
    ).count()
    assert swarm_pairs == 0  # 21-member bucket (> cap) dropped everywhere
    # the planted exact dup of doc 0 (id 200000) is still found
    found = {
        (r["id_a"], r["id_b"]) for r in capped.filter(F.col("id_b") == 200000).collect()
    }
    assert (0, 200000) in found


def test_contamination_detects_planted_leak(spark):
    """An eval doc copying a train doc's text must surface as a
    contaminated pair with a large shared-gram count."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") >= 10)
    leaked = docs.filter(F.col("doc_id") == 10).select(
        F.lit(900000).cast("long").alias("doc_id"), "text"
    )
    eval_set = docs.filter(F.col("doc_id") < 10).unionByName(leaked)
    pairs = {
        (r["train_id"], r["eval_id"]): r["n_shared"]
        for r in dedup.cross_set_ngram_overlap(train, eval_set, n=5).collect()
    }
    assert (10, 900000) in pairs
    # identical text: shared grams == the doc's own distinct gram count
    n_grams = (
        train.filter(F.col("doc_id") == 10)
        .select(F.size(dedup.word_shingles_col("text", 5)).alias("n"))
        .collect()[0]["n"]
    )
    assert pairs[(10, 900000)] == n_grams


def test_lsh_ann_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {
        r["vec_id"]
        for r in similarity.topk_cosine(emb, query_vec_id=0, k=10).collect()
    }
    approx = {
        r["vec_id"]
        for r in similarity.topk_cosine_lsh(
            emb, query_vec_id=0, k=10, n_planes=4, probe_radius=2
        ).collect()
    }
    # 4 planes + radius-2 multi-probe on 500 random vecs
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_embedding_near_dup_recall_on_planted_pairs(spark):
    """Every planted near-identical pair (cos ≈ 0.999998) must survive
    the 8-table × 8-plane banding AND no false positive may appear —
    the base embeddings are near-orthogonal (max pair cos ≈ 0.51)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x * (1.0 + 0.002 * ((i % 3) - 1))
        ).alias("embedding"),
    )
    pairs = similarity.embedding_near_dup_pairs(
        emb.unionByName(planted), min_cosine=0.95
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(i, i + 1_000_000) for i in range(10)}


def test_embedding_near_dup_hot_bucket_cap(spark):
    """With a cap of 1, every bucket holding >1 entry (i.e. all of them,
    in every table, for identical vectors) is dropped — planted exact
    duplicates must NOT pair up, proving the O(m²)-bucket bound engages."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dup = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    pairs = similarity.embedding_near_dup_pairs(
        emb.unionByName(dup), min_cosine=0.95, max_bucket_size=1
    )
    assert pairs.count() == 0


def test_near_dup_clusters_resolves_components(spark):
    """Chain 1-2-3 and pair 10-11 collapse to min-id clusters with the
    canonical member flagged keep."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    rows = {r["node_id"]: r for r in dedup.near_dup_clusters(pairs).collect()}
    assert {n: r["cluster_id"] for n, r in rows.items()} == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
    }
    assert {n for n, r in rows.items() if r["keep"]} == {1, 10}


def test_near_dup_clusters_matches_recursive_cte_oracle(spark, duck):
    """Pytest-level oracle: min-label connected components over a
    deterministic pseudo-random graph must match DuckDB's recursive-CTE
    transitive closure."""
    import random

    rng = random.Random(11)
    edges = sorted({tuple(sorted(rng.sample(range(60), 2))) for _ in range(45)})
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r["node_id"], r["cluster_id"])
        for r in dedup.near_dup_clusters(pairs).collect()
    }
    values = ", ".join(f"({a}, {b})" for a, b in edges)
    oracle = duck.execute(f"""
        WITH RECURSIVE
        e(src, dst) AS (
            SELECT id_a, id_b FROM (VALUES {values}) t(id_a, id_b)
            UNION ALL
            SELECT id_b, id_a FROM (VALUES {values}) t(id_a, id_b)
        ),
        nodes(node) AS (SELECT DISTINCT src FROM e),
        reach(node, lab) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node
        )
        SELECT node, MIN(lab) AS cluster_id FROM reach GROUP BY node
    """).fetchall()
    assert got == {(n, c) for n, c in oracle}


def test_near_dup_clusters_windowed_stars_match_union_find(spark):
    """r9 internals change: each star round derives its neighborhood
    min from a window over the same rows instead of a groupBy + join
    back. Pin exact-output equivalence against a driver-side
    union-find on messy inputs the window path must survive: self
    loops, duplicate pairs (both orders), and multi-component graphs
    with singleton self-loop nodes."""
    import random

    rng = random.Random(29)
    edges = [(n, n) for n in (100, 101)]  # self-loop-only singletons
    edges += [tuple(rng.sample(range(40), 2)) for _ in range(50)]
    edges += [(b, a) for a, b in edges[2:20]]  # reversed duplicates
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labels: one more pass so every node maps to its root min
    want = {}
    roots: dict[int, int] = {}
    for n in parent:
        r = find(n)
        roots[r] = min(roots.get(r, r), n)
    for n in parent:
        want[n] = roots[find(n)]

    got = {
        r["node_id"]: (r["cluster_id"], r["keep"])
        for r in dedup.near_dup_clusters(pairs).collect()
    }
    assert {n: c for n, (c, _) in got.items()} == want
    assert {n for n, (c, k) in got.items() if k} == {
        n for n, c in want.items() if n == c
    }


def test_tune_lsh_params_matches_shipped_defaults():
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup import (
        DEFAULT_BANDS,
        DEFAULT_NUM_PERM,
        tune_lsh_params,
    )

    # the shipped 8x4 banding is the S-curve optimum for the module's
    # 0.5 candidate threshold — the tuner derives it, not folklore
    bands, rows = tune_lsh_params(0.5, DEFAULT_NUM_PERM)
    assert (bands, rows) == (DEFAULT_BANDS, DEFAULT_NUM_PERM // DEFAULT_BANDS)


def test_tune_lsh_params_rows_grow_with_threshold():
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup import (
        tune_lsh_params,
    )

    rows_at = [tune_lsh_params(t, 128)[1] for t in (0.2, 0.4, 0.6, 0.8, 0.95)]
    assert rows_at == sorted(rows_at)  # stricter thresholds -> longer bands
    for t in (0.2, 0.5, 0.8):
        b, r = tune_lsh_params(t, 128)
        assert b * r == 128


def test_dup_passages_two_phase_matches_direct(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        dup_passages,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )
    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    direct = [tuple(r) for r in dup_passages(docs, two_phase=False).collect()]
    hashed = [tuple(r) for r in dup_passages(docs, two_phase=True).collect()]
    assert direct == hashed
    assert direct  # non-vacuous


def test_dup_passages_two_phase_tie_plateau_falls_back(spark):
    """30 distinct passages all tied at count 2 with a candidate cap of
    6: hash-ordered truncation would pick the wrong lexicographic
    winners, so the plateau guard must fall back to the direct form."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.textstats import (
        dup_passages,
    )

    rows = []
    did = 0
    for i in range(30):
        passage = f"p{i:02d} common tied words here"
        for _ in range(2):  # each passage in exactly 2 docs
            rows.append((did, passage))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    direct = [tuple(r) for r in dup_passages(df, k=3, two_phase=False).collect()]
    hashed = [
        tuple(r)
        for r in dup_passages(df, k=3, two_phase=True, candidate_slack=2).collect()
    ]
    assert direct == hashed
    assert len(direct) == 3 and all(n == 2 for _p, n in direct)


def _synthetic_docs(spark, n, dup_block=0):
    """n docs with id-derived distinct 12-token texts; the first
    `dup_block` docs share one identical text (a degenerate hot cluster)."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < dup_block, F.lit("common boilerplate page " * 3))
        .otherwise(
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{j}_"), F.conv(F.col("id") * (j + 7) % 99991, 10, 36))
                    for j in range(12)
                ],
            )
        )
        .alias("text"),
    )


def test_choose_bucket_cap_healthy_corpus_is_uncapped(spark):
    """Distinct-content corpus: the sampled detector must conclude no
    cap is needed, so the pair pipeline stays byte-identical to the
    uncapped plan (the closed loop costs only the ~5% detector pass)."""
    docs = _synthetic_docs(spark, 4000)
    assert dedup.choose_bucket_cap(docs) is None


def test_choose_bucket_cap_degenerate_corpus_tunes_a_cap(spark):
    """1500 identical docs in a 4000-doc corpus: every band puts them in
    one 1500-member bucket; the detector must fire and the tuned cap
    must exclude that bucket while staying >= the recall floor."""
    docs = _synthetic_docs(spark, 4000, dup_block=1500)
    cap = dedup.choose_bucket_cap(docs)
    assert cap is not None
    assert 16 <= cap < 1500


def test_auto_cap_bounds_degenerate_pair_blowup(spark):
    """The auto cap must keep candidate pairs near the per-doc budget on
    a corpus where uncapped LSH would generate ~1.1M pairs from one
    degenerate cluster."""
    docs = _synthetic_docs(spark, 4000, dup_block=1500)
    n_pairs = dedup.minhash_lsh_candidates(docs, min_est_jaccard=0.5).count()
    # uncapped would be >= 1500*1499/2 ≈ 1.12M pairs from the hot
    # cluster alone; budget is 8 pairs/doc = 32k plus floor-protected
    # small buckets
    assert n_pairs < 100_000



def test_components_resolve_long_chains_in_log_rounds(spark):
    """Pointer doubling: a 3000-edge path graph (diameter 3000) must
    resolve inside 20 rounds — the 10x-scale entity-chain regression
    (plain 1-hop min propagation needs diameter rounds and died on the
    ladder's nation-blocked edit-1 name chains)."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup import (
        near_dup_clusters,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(3000)], "id_a long, id_b long"
    )
    rows = near_dup_clusters(edges, max_iters=20).collect()
    assert len(rows) == 3001
    assert {r["cluster_id"] for r in rows} == {0}
    assert sum(r["keep"] for r in rows) == 1


def test_components_random_ids_converge_in_log_rounds(spark):
    """The round-4 bench crash class: a path graph whose node ids are
    RANDOM with respect to the topology (shuffled), exactly like
    custkeys along an edit-1 name chain. Min-label propagation's
    pointer-doubling shortcut degrades to O(diameter) rounds here
    (26 rounds on the sf0.1 linkage graph); star contraction must stay
    logarithmic. Pins the round counter, not just the result."""
    import random

    rng = random.Random(7)
    ids = list(range(2000))
    rng.shuffle(ids)
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(1999)], "id_a long, id_b long"
    )
    rows = dedup.near_dup_clusters(edges, max_iters=16).collect()
    assert len(rows) == 2000
    assert {r["cluster_id"] for r in rows} == {0}
    assert dedup.LAST_CLUSTER_ITERS <= 12, dedup.LAST_CLUSTER_ITERS


def test_components_self_loops_and_empty_input(spark):
    """Self-loop-only nodes are singletons (their own cluster, keep);
    an empty pair set returns an empty frame with the right schema."""
    pairs = spark.createDataFrame([(5, 5), (1, 2)], "id_a long, id_b long")
    rows = {r["node_id"]: r for r in dedup.near_dup_clusters(pairs).collect()}
    assert rows[5]["cluster_id"] == 5 and rows[5]["keep"]
    assert rows[1]["cluster_id"] == 1 and rows[2]["cluster_id"] == 1
    empty = spark.createDataFrame([], "id_a long, id_b long")
    out = dedup.near_dup_clusters(empty)
    assert out.columns == ["node_id", "cluster_id", "keep"]
    assert out.count() == 0


def test_ngram_containment_detects_embedded_doc(spark):
    """A short doc fully contained in a long one: containment from the
    short side ~1.0 even though Jaccard is low."""
    short = "alpha beta gamma delta epsilon"
    long_ = (
        "intro words here " + short + " and then a lot of other trailing "
        "content that dilutes the union far beyond the intersection size"
    )
    docs = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string"
    )
    rows = dedup.ngram_containment_pairs(docs, n=3, min_containment=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment_a"] == 1.0  # every 3-gram of the short doc is in the long
    assert r["containment_b"] < 0.5


def test_minhash_jaccard_identical_docs_est_1000(spark):
    """Identical texts agree on every md5-seeded signature component:
    the pair always surfaces (every band collides) with est 1000."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely unrelated text about spark shuffle partitions"),
        ],
        "doc_id long, text string",
    )
    out = dedup.minhash_jaccard_pairs(docs).collect()
    assert [(r["id_a"], r["id_b"], r["est_milli"]) for r in out] == [(1, 2, 1000)]


def test_minhash_jaccard_bucket_cap_drops_mega_bucket(spark):
    """A 60-member identical-text bucket exceeds the cap (50): capped
    out BEFORE pair expansion -> no quadratic blowup, no pairs."""
    docs = spark.createDataFrame(
        [(i, "same boilerplate text repeated on every page") for i in range(60)],
        "doc_id long, text string",
    )
    assert dedup.minhash_jaccard_pairs(docs).count() == 0


def test_simhash_md5_identical_docs_hamming_zero(spark):
    """Identical token sets produce identical md5-voted signatures:
    the pair surfaces with hamming 0; unrelated text does not pair."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely unrelated text about spark shuffle partitions"),
        ],
        "doc_id long, text string",
    )
    out = dedup.simhash_md5_pairs(docs).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out] == [(1, 2, 0)]


def test_simhash_md5_near_identical_within_hamming(spark):
    """One token swapped out of a long document flips few vote
    majorities: the pair stays within the hamming<=3 bar, and the
    hamming value equals a pure-python replay of the same md5 votes
    (the oracle-twin property, engine vs stdlib)."""
    base = " ".join(f"tok{i}" for i in range(60))
    variant = " ".join(f"tok{i}" for i in range(59)) + " swapped"
    docs = spark.createDataFrame(
        [(1, base), (2, variant)], "doc_id long, text string"
    )
    out = dedup.simhash_md5_pairs(docs).collect()
    assert len(out) == 1

    import hashlib

    def sig(text):
        votes = [0] * 60
        for t in set(text.split()):
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for b in range(60):
                votes[b] += 1 if (h >> b) & 1 else -1
        return sum(1 << b for b in range(60) if votes[b] > 0)

    expected = bin(sig(base) ^ sig(variant)).count("1")
    assert out[0]["hamming"] == expected <= 3


def test_embedding_lsh_exact_agrees_with_brute_force(spark):
    """Planted near-parallel vectors pair; the kept set is a SUBSET of
    the brute-force >=0.35 pair set (LSH never fabricates a pair) and
    the planted pair itself is captured with its exact cosine."""
    import random

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        embedding_lsh_pairs_exact,
    )

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(64)]
    near = [x + rng.gauss(0, 0.02) for x in base]
    rows = [(1, base), (2, near)] + [
        (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(3, 40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in embedding_lsh_pairs_exact(emb).collect()}
    assert (1, 2) in out and out[(1, 2)] > 0.99

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return d / (na * nb)

    vecs = dict(rows)
    for (a, b), c in out.items():
        assert cos(vecs[a], vecs[b]) >= 0.345, (a, b, c)


def test_embedding_lsh_exact_bucket_cap(spark):
    """A degenerate bucket (duplicated vector repeated past the cap)
    is dropped before pair expansion."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        embedding_lsh_pairs_exact,
    )

    rows = [(i, [1.0] * 64) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert embedding_lsh_pairs_exact(emb, max_bucket_size=10).count() == 0


def test_substring_fingerprint_dups_planted_quote(spark):
    """A long verbatim run embedded in two otherwise-distinct docs is
    flagged, while unrelated docs are not — the substring class
    word-Jaccard misses (shared run is a small fraction of each doc)."""
    import random

    rng = random.Random(3)
    quote = " ".join(f"lic{i}" for i in range(40))  # ~240-char license block

    def page(seed):
        return " ".join(f"w{seed}_{j}" for j in range(120))

    docs = spark.createDataFrame(
        [
            (1, page(1) + " " + quote + " " + page(11)),
            (2, page(2) + " " + quote + " " + page(12)),
            (3, page(3)),
            (4, page(4)),
        ],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r["n_shared"] for r in
           dedup.substring_fingerprint_dups(docs).collect()}
    assert (1, 2) in out and out[(1, 2)] >= 2
    assert all(p == (1, 2) for p in out)


def test_substring_fingerprint_dups_hot_cap(spark):
    """A fingerprint shared by more docs than the cap is dropped before
    pair expansion (boilerplate guard)."""
    docs = spark.createDataFrame(
        [(i, "identical boilerplate page body repeated everywhere " * 3)
         for i in range(30)],
        "doc_id long, text string",
    )
    assert dedup.substring_fingerprint_dups(docs, max_bucket_size=10).count() == 0


def test_margin_knn_match_prefers_specific_neighbor(spark):
    """A planted near-parallel cross-group pair wins with a high
    margin, while a 'hub' target (near the group centroid, similar to
    EVERYTHING) is suppressed by its own neighborhood denominator —
    the Artetxe-margin property that plain nearest-neighbor lacks."""
    import random

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        margin_knn_match,
    )

    rng = random.Random(11)
    base = [rng.gauss(0, 1) for _ in range(64)]
    rows = []
    # src group (label 0): one planted vector + noise
    rows.append((1, [x + rng.gauss(0, 0.02) for x in base], 0))
    for i in range(2, 12):
        rows.append((i, [rng.gauss(0, 1) for _ in range(64)], 0))
    # tgt group (label 1): the planted twin + noise
    rows.append((101, [x + rng.gauss(0, 0.02) for x in base], 1))
    for i in range(102, 112):
        rows.append((i, [rng.gauss(0, 1) for _ in range(64)], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r["src_id"]: r for r in margin_knn_match(emb).collect()}
    assert 1 in out and out[1]["tgt_id"] == 101
    assert out[1]["cos_e6"] > 990000  # near-parallel
    assert out[1]["margin_milli"] > 1500  # far above neighborhood mean
    # random srcs rarely clear the margin bar; the planted one dominates
    assert all(r["margin_milli"] >= 1020 for r in out.values())

"""Quality classifier (operators/classify.py) and SemDeDup
(operators/similarity.py:semantic_dedup) — reference-free quality
checks beyond the DuckDB oracle parity in test_queries_oracle.py:
closed-form weight verification, better-than-majority accuracy, and
brute-force within-cluster parity for the semantic dedup.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.classify import (
    classify_corpus,
    prior_milli,
    train_token_weights,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
    semantic_dedup,
)

from .conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lg) for i, (t, lg) in enumerate(rows)]
    )


def test_weights_match_closed_form(spark):
    """Hand-computed Naive Bayes log-odds on a 4-doc corpus."""
    docs = _docs(
        spark,
        [
            ("the cat sat", "en"),
            ("the dog ran", "en"),
            ("le chat noir", "fr"),
            ("le chien brun", "fr"),
        ],
    )
    w = {
        r["term"]: r
        for r in train_token_weights(docs, vocab_size=100).collect()
    }
    # 10 distinct terms, 6 positive tokens, 6 negative tokens
    assert len(w) == 10
    v, pt, nt = 10, 6, 6

    def expect(c_pos, c_neg):
        return round(
            1000.0
            * (
                math.log((c_pos + 1) / (pt + v))
                - math.log((c_neg + 1) / (nt + v))
            )
        )

    assert w["the"]["weight_milli"] == expect(2, 0)
    assert w["le"]["weight_milli"] == expect(0, 2)
    assert w["cat"]["weight_milli"] == expect(1, 0)


def test_prior_and_scores_separate_the_classes(spark):
    docs = _docs(
        spark,
        [
            ("the cat sat on the mat", "en"),
            ("the dog ran to the park", "en"),
            ("a bird flew over the house", "en"),
            ("le chat noir dort ici", "fr"),
            ("le chien brun court vite", "fr"),
            ("un oiseau vole sur la maison", "fr"),
        ],
    )
    scored = classify_corpus(docs).collect()
    by_id = {r["doc_id"]: r for r in scored}
    assert all(by_id[i]["pred_pos"] == 1 for i in range(3))
    assert all(by_id[i]["pred_pos"] == 0 for i in range(3, 6))
    # balanced classes → zero prior
    assert prior_milli(docs).collect()[0]["prior_milli"] == 0


def test_vocab_cap_bounds_model_size(spark):
    docs = _docs(spark, [(" ".join(f"t{i}_{j}" for j in range(50)), "en") for i in range(4)]
                 + [(" ".join(f"u{i}_{j}" for j in range(50)), "fr") for i in range(4)])
    w = train_token_weights(docs, vocab_size=64)
    assert w.count() == 64


def test_classifier_ranks_positive_class_higher_on_testdata(spark):
    """On the synthetic corpus (mostly random tokens, so accuracy stays
    near the majority baseline) the scores must still RANK en above
    non-en: pairwise AUC clearly above chance, and a higher mean score
    for the positive class — the minimum bar for 'the weights carry
    signal'."""
    import numpy as np

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    scored = classify_corpus(docs).toPandas()
    pos = scored[scored.is_pos == 1].score_milli.values
    neg = scored[scored.is_pos == 0].score_milli.values
    auc = (pos[:, None] > neg[None, :]).mean() + 0.5 * (
        pos[:, None] == neg[None, :]
    ).mean()
    assert auc > 0.55, auc
    assert np.mean(pos) > np.mean(neg)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )


def test_semantic_dedup_drops_planted_exact_dups(spark):
    """Exact duplicates always share a cluster (deterministic argmin on
    identical vectors) → the higher id must be dropped."""
    base = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 1.0, 0.0]]
    vecs = base + [base[0], base[2]]  # ids 4,5 duplicate ids 0,2
    out = semantic_dedup(_emb_df(spark, vecs), k=2, iters=2, min_cosine=0.999)
    kept = sorted(r["vec_id"] for r in out.collect())
    assert 4 not in kept and 5 not in kept
    assert set(kept) == {0, 1, 2, 3}


def test_semantic_dedup_matches_bruteforce_within_clusters(spark):
    """With pinned assignments, survivors must equal the brute-force
    min-id rule computed in Python over every within-cluster pair."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 8)
    # plant near-duplicates
    for src, dst in [(3, 40), (11, 41), (25, 42)]:
        vecs[dst] = vecs[src] + rng.randn(8) * 1e-3
    emb = _emb_df(spark, vecs.tolist())
    assignments = spark.createDataFrame(
        [Row(vec_id=i, cluster=int(i % 4 if i < 40 else (i - 40) % 4)) for i in range(60)]
    )
    # make each planted pair share a cluster
    assignments = assignments.withColumn(
        "cluster",
        F.when(F.col("vec_id") == 40, F.lit(3 % 4))
        .when(F.col("vec_id") == 41, F.lit(11 % 4))
        .when(F.col("vec_id") == 42, F.lit(25 % 4))
        .otherwise(F.col("cluster")),
    )
    tau = 0.97
    out = semantic_dedup(
        emb, min_cosine=tau, assignments=assignments
    )
    kept = sorted(r["vec_id"] for r in out.collect())

    clusters = {r["vec_id"]: r["cluster"] for r in assignments.collect()}
    norms = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    dropped = set()
    for b in range(60):
        for a in range(b):
            if clusters[a] == clusters[b] and float(norms[a] @ norms[b]) >= tau:
                dropped.add(b)
    assert kept == sorted(set(range(60)) - dropped)
    assert {40, 41, 42} <= dropped


def test_semantic_dedup_registry_query_runs(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans.queries import (
        q_semantic_dedup,
    )

    out = q_semantic_dedup(spark, SF_DIR)
    n = out.count()
    total = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert 0 < n <= total


def test_single_class_corpus_yields_finite_scores(spark):
    """Degenerate corpus (every doc positive): the smoothed prior must
    keep scores finite and positive, never NULL."""
    docs = _docs(spark, [("all english words here", "en"), ("more english", "en")])
    rows = classify_corpus(docs).collect()
    assert all(r["score_milli"] is not None for r in rows)
    assert all(r["pred_pos"] == 1 for r in rows)


def test_semantic_dedup_zero_vectors_are_duplicates(spark):
    """All-zero embeddings (blank docs under hash_embed) are exact
    duplicates of each other and must dedup to the lowest id."""
    vecs = [[0.0, 0.0, 0.0], [1.0, 2.0, 3.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]]
    out = semantic_dedup(_emb_df(spark, vecs), k=2, iters=2, min_cosine=0.99)
    kept = sorted(r["vec_id"] for r in out.collect())
    assert kept == [0, 1]

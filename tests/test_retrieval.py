"""BM25 retrieval + weighted sampling: semantics and plan shape.

Oracle parity for both queries is covered by tests/test_queries_oracle.py
(they carry full DuckDB oracles even though they sit outside the
driver's 50-entry correctness window).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.retrieval import (
    bm25_topk,
    term_postings,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
    weighted_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_tf_ranks_heavier_doc_first(spark):
    docs = _docs(
        spark,
        [
            (1, "vector vector vector pad pad pad pad pad"),
            (2, "vector pad pad pad pad pad pad pad"),
            (3, "pad pad pad pad pad pad pad pad"),
        ],
    )
    got = bm25_topk(docs, ["vector"], k=10).collect()
    assert [r.doc_id for r in got] == [1, 2]  # doc 3 never matches
    assert got[0].score > got[1].score > 0
    assert [r.rnk for r in got] == [1, 2]


def test_bm25_length_normalization_prefers_short_doc(spark):
    # same tf=1, but doc 2 is much longer → lower score at b=0.75
    docs = _docs(
        spark,
        [
            (1, "vector pad pad pad"),
            (2, "vector " + "pad " * 40),
        ],
    )
    got = {r.doc_id: r.score for r in bm25_topk(docs, ["vector"], k=10).collect()}
    assert got[1] > got[2]


def test_bm25_rare_term_outweighs_common(spark):
    # 'rare' appears in 1 of 4 docs, 'common' in all → higher idf for rare
    docs = _docs(
        spark,
        [
            (1, "rare common pad pad"),
            (2, "common pad pad pad"),
            (3, "common pad pad pad"),
            (4, "common pad pad pad"),
        ],
    )
    got = {r.doc_id: r.score for r in bm25_topk(docs, ["rare", "common"], k=10).collect()}
    only_common = max(got[d] for d in (2, 3, 4))
    assert got[1] > 2 * only_common


def test_term_postings_carries_full_doc_length(spark):
    docs = _docs(spark, [(1, "vector pad pad pad pad")])
    row = term_postings(docs, ["vector"]).collect()[0]
    assert (row.tf, row.dl) == (1, 5)  # dl counts non-matching tokens too


def test_bm25_plan_is_topk_with_single_corpus_pass(spark):
    docs = _docs(spark, [(i, f"vector pad{i}") for i in range(20)])
    topk = bm25_topk(docs, ["vector"], k=5)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # df must NOT be a count-over-window partitioned by term (the
    # hot-term single-task funnel this shape replaced). Exchange reuse
    # for the postings subtree is asserted on the parquet-backed
    # bm25_search plan in test_plan_quality (ExistingRDD scans don't
    # canonicalize across the self-join re-alias, so it can't fire here).
    assert "windowspecdefinition(term" not in plan


def test_weighted_sample_is_deterministic_and_sized(spark):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w")
    )
    a = weighted_sample(df, "doc_id", "w", k=20).collect()
    b = weighted_sample(df, "doc_id", "w", k=20).collect()
    assert a == b
    assert len(a) == 20


def test_weighted_sample_favors_heavy_rows(spark):
    # 10 rows with weight 10_000 vs 490 with weight 1: the heavy rows'
    # Exp(w) keys are ~10^4 smaller, so all 10 must be in the top 20
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 10, F.lit(10_000)).otherwise(F.lit(1)).alias("w"),
    )
    got = {r.doc_id for r in weighted_sample(df, "doc_id", "w", k=20).collect()}
    assert set(range(10)) <= got


def test_bm25_many_matches_per_query_single(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.retrieval import (
        bm25_topk_many,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )
    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    qs = {1: ["vector", "hash"], 2: ["join", "merge", "scan"]}
    many = bm25_topk_many(docs, qs, k=5)
    got = {
        qid: [(r.doc_id, r.score, r.rnk) for r in rows]
        for qid, rows in (
            (q, sorted(
                [r for r in many.collect() if r.query_id == q],
                key=lambda r: r.rnk,
            ))
            for q in qs
        )
    }
    for qid, terms in qs.items():
        single = [
            (r.doc_id, r.score, r.rnk)
            for r in bm25_topk(docs, terms, k=5).collect()
        ]
        assert got[qid] == single, qid


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 90, F.lit(0)).otherwise(F.lit(1)).alias("w"),
    )
    got = {r.doc_id for r in weighted_sample(df, "doc_id", "w", k=50).collect()}
    assert got == set(range(90, 100))  # zero-weight rows never selected


def test_bm25_many_dedupes_repeated_query_terms(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_many,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )
    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    single = {
        (r["doc_id"], round(r["score"], 6))
        for r in bm25_topk(docs, ["hash", "hash", "join"], k=5).collect()
    }
    many = {
        (r["doc_id"], round(r["score"], 6))
        for r in bm25_topk_many(docs, {7: ["hash", "hash", "join"]}, k=5).collect()
    }
    assert single == many


def test_hybrid_rrf_fuses_both_systems(spark):
    """A document ranked by BOTH systems outranks one of equal single-
    system rank; single-system documents carry a NULL for the other
    rank and still score."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.retrieval import (
        hybrid_rrf_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "vector vector vector"),   # lexical hit only
            (2, "vector hash join"),       # lexical hit + vector neighbor
            (3, "nothing relevant here"),  # vector neighbor only
            (4, "filler words entirely"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # query
            (2, [0.9, 0.1]),
            (3, [0.8, 0.2]),
            (4, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_rrf_topk(
        docs, emb, ["vector", "hash"], query_vec_id=0, k=4, pool=3
    ).collect()
    by_id = {r["id"]: r for r in out}
    # doc 2 is in both pools → top fused rank
    assert out[0]["id"] == 2
    assert by_id[2]["lex_rank"] is not None and by_id[2]["sem_rank"] is not None
    # single-system docs carry NULL for the missing system
    assert by_id[1]["sem_rank"] is None and by_id[1]["lex_rank"] is not None
    assert by_id[3]["lex_rank"] is None and by_id[3]["sem_rank"] is not None
    # rrf of doc 2 is the sum of both reciprocal terms
    r = by_id[2]
    expect = 1.0 / (60 + r["lex_rank"]) + 1.0 / (60 + r["sem_rank"])
    assert abs(r["rrf_score"] - round(expect, 9)) < 1e-12

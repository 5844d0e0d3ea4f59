"""Feature-hashed document embeddings (operators/embed.py) and the
documents → hash_embed → semantic_dedup composition."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.embed import (
    hash_embed,
    hash_embed_sparse,
)

from .conftest import SF_DIR


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def _ref_sparse(texts, dim=16):
    """Python reference: md5 hex-digit bucket, parity sign."""
    out = {}
    for i, t in enumerate(texts):
        for tok in t.split():
            h = hashlib.md5(tok.lower().encode()).hexdigest()
            b = int(h[0], 16) % dim
            s = 1 if h[1] in "02468ace" else -1
            out[(i, b)] = out.get((i, b), 0) + s
    return {k: v for k, v in out.items() if v != 0}


def test_sparse_matches_python_reference(spark):
    texts = ["the cat sat on the mat", "a b c d e f g", "the the the"]
    got = {
        (r["doc_id"], r["dim"]): r["weight"]
        for r in hash_embed_sparse(_docs(spark, texts)).collect()
    }
    assert got == _ref_sparse(texts)


def test_dense_is_densified_sparse_with_zero_for_empty(spark):
    texts = ["hello world hello", "   ", "solo"]
    docs = _docs(spark, texts)
    sparse = {
        (r["doc_id"], r["dim"]): r["weight"]
        for r in hash_embed_sparse(docs).collect()
    }
    dense = {r["doc_id"]: r["embedding"] for r in hash_embed(docs).collect()}
    assert set(dense) == {0, 1, 2}
    assert len(dense[0]) == 16
    for (i, d), w in sparse.items():
        assert dense[i][d] == float(w)
    # blank doc embeds as the zero vector, not a missing row
    assert dense[1] == [0.0] * 16
    # non-sparse positions are zero
    assert sum(1 for x in dense[0] if x != 0.0) == len(
        [k for k in sparse if k[0] == 0]
    )


def test_identical_texts_share_embeddings_and_dedup(spark):
    """Exact-duplicate text → identical hash embedding → the
    composition must drop the higher doc_id."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.similarity import (
        semantic_dedup,
    )

    texts = [
        "unique document about spark shuffles and exchanges",
        "completely different words covering columnar storage",
        "unique document about spark shuffles and exchanges",  # dup of 0
    ]
    emb = hash_embed(_docs(spark, texts))
    kept = sorted(
        r["doc_id"]
        for r in semantic_dedup(
            emb, k=2, iters=2, min_cosine=0.999, id_col="doc_id"
        ).collect()
    )
    assert kept == [0, 1]


def test_registry_queries_run(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans.queries import (
        q_text_semantic_dedup,
    )

    total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    n = q_text_semantic_dedup(spark, SF_DIR).count()
    assert 0 < n <= total


def test_hash_embed_additivity_property(spark):
    """Linearity of the hashing trick: embedding(a ⊕ " " ⊕ b) =
    embedding(a) + embedding(b) for non-blank a, b — the invariant
    that makes hashed features mergeable across chunks/shards."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    WORD = st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=8)
    PIECE = st.lists(WORD, min_size=1, max_size=6).map(" ".join)
    collected = []

    @settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(PIECE, PIECE)
    def collect(a, b):
        collected.append((a, b))

    collect()
    rows = []
    for i, (a, b) in enumerate(collected):
        rows += [
            Row(doc_id=3 * i, text=a),
            Row(doc_id=3 * i + 1, text=b),
            Row(doc_id=3 * i + 2, text=a + " " + b),
        ]
    dense = {
        r["doc_id"]: r["embedding"]
        for r in hash_embed(spark.createDataFrame(rows)).collect()
    }
    for i, (a, b) in enumerate(collected):
        ea, eb, eab = dense[3 * i], dense[3 * i + 1], dense[3 * i + 2]
        assert [x + y for x, y in zip(ea, eb)] == eab, (a, b)

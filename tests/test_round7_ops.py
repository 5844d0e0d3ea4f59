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

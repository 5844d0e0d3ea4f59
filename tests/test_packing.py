"""Sequence packing invariants: determinism, budget overshoot bound,
contiguity of pack ids within a stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    packing,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR


def test_pack_overshoot_bound(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "n_chars")
    budget = 4000
    packed = packing.pack_sequences(docs, "n_chars", budget, stream_col="lang")
    stats = packing.pack_stats(packed, "n_chars", "lang").collect()
    max_doc = {
        r["lang"]: r["m"]
        for r in docs.groupBy("lang").agg(F.max("n_chars").alias("m")).collect()
    }
    for r in stats:
        # offset packing: a pack exceeds budget by less than one document
        assert r["total_cost"] < budget + max_doc[r["lang"]], r


def test_pack_ids_contiguous_and_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "n_chars")
    packed = packing.pack_sequences(docs, "n_chars", 4000, stream_col="lang")
    per_stream = {
        r["lang"]: sorted(r["ids"])
        for r in packed.groupBy("lang")
        .agg(F.collect_set("pack_id").alias("ids"))
        .collect()
    }
    for lang, ids in per_stream.items():
        assert ids == list(range(len(ids))), (lang, ids[:5], ids[-5:])
    again = packing.pack_sequences(docs, "n_chars", 4000, stream_col="lang")
    assert packed.exceptAll(again).count() == 0
    assert again.exceptAll(packed).count() == 0


def test_chunk_documents_covers_text_and_matches_duckdb(spark, duck):
    """Chunk geometry (start offsets, overlap, remainder chunk) must
    reconstruct the document and match a DuckDB generate_series
    implementation exactly on the real corpus."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.packing import (
        chunk_documents,
    )
    from .conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    chunks = chunk_documents(docs, chunk_chars=400, overlap=50)
    got = {
        (r["doc_id"], r["chunk_idx"], r["chunk_start"], r["chunk"], r["n_chunks"])
        for r in chunks.collect()
    }
    oracle = duck.execute(f"""
        WITH d AS (SELECT doc_id, text, length(text) AS n
                   FROM read_parquet('{SF_DIR}/documents.parquet')),
        g AS (SELECT doc_id, text,
                     GREATEST(CAST(CEIL((n - 50) / 350.0) AS INTEGER), 1) AS n_chunks
              FROM d)
        SELECT doc_id,
               CAST(k AS INTEGER) AS chunk_idx,
               CAST(k * 350 AS INTEGER) AS chunk_start,
               substring(text, CAST(k * 350 + 1 AS INTEGER), 400) AS chunk,
               n_chunks
        FROM g, UNNEST(generate_series(0, n_chunks - 1)) AS t(k)
    """).fetchall()
    assert got == set(map(tuple, oracle))

    # stitching chunks back with overlap removed reproduces the text
    from pyspark.sql import functions as F

    rebuilt = (
        chunks.withColumn(
            "part",
            F.when(F.col("chunk_idx") == 0, F.col("chunk")).otherwise(
                F.substring(F.col("chunk"), 51, 400)
            ),
        )
        .groupBy("doc_id")
        .agg(F.concat_ws("", F.array_sort(F.collect_list(F.struct("chunk_idx", "part")))["part"]).alias("glued"))
    )
    joined = rebuilt.join(docs, "doc_id").filter(F.col("glued") != F.col("text"))
    assert joined.count() == 0


def test_assign_global_ids_contiguous_and_ordered(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.packing import (
        assign_global_ids,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )
    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    out = assign_global_ids(docs, "doc_id", num_partitions=16).collect()
    n = len(out)
    ids = sorted((r["doc_id"], r["row_id"]) for r in out)
    # contiguous 0..n-1, and row_id order == doc_id order
    assert sorted(r["row_id"] for r in out) == list(range(n))
    assert [p[1] for p in ids] == list(range(n))

    # deterministic across re-execution (range bounds sampling is seeded)
    again = assign_global_ids(docs, "doc_id", num_partitions=16).collect()
    assert {(r["doc_id"], r["row_id"]) for r in again} == set(ids)

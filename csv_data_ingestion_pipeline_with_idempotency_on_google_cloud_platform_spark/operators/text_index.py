"""Materialized full-text index: the on-disk scale path for BM25.

`retrieval.bm25_topk` tokenizes the corpus per query — right for
ad-hoc slicing, but a retrieval service at 100 TB cannot re-scan and
re-tokenize everything for every keyword lookup. The deployment shape
(the third member of the index trio, next to ann_index's IVF cells and
dedup_index's MinHash bands) materializes postings ONCE:

- `write_text_index`: one tokenize pass builds the (doc_id, term, tf,
  dl) postings, hive-partitioned by an engine-independent md5 bucket
  of the term and sorted by term within each partition — so a probe
  prunes partitions via the bucket predicate AND skips row groups via
  term min/max footer stats (the same two-level pruning the MinHash
  band index uses). The per-term document frequencies land beside them
  (same layout), and corpus scalars (N, avgdl) in a 1-row `_meta`
  sidecar.
- `bm25_search_indexed`: compute the query terms' buckets ON THE
  DRIVER (md5 is engine-independent, so no Spark job is needed to
  route a probe), read only those bucket directories filtered to the
  query terms, broadcast-join the (tiny) matching df rows, and score
  with the exact `retrieval` formula. Probe cost scales with the
  probed buckets' share of the postings, not the corpus — and the
  scores are IDENTICAL to `bm25_topk` on the same corpus by
  construction (same tokenizer, same integer counts, same formula;
  parity is test-pinned).

Appends follow the ledger convention: `append_to_text_index` adds a
batch's postings under the same bucket layout and REBUILDS the small
df/meta sidecars from the merged postings (a partial/final count over
the index — no corpus rescan), so idf stays exact after every batch.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from ..utils import parallelize_narrow


def _bucket_col(term, n_buckets: int):
    """Engine-independent bucket: first 8 hex chars of md5 → u32 mod
    n_buckets (the sampling.py convention — reproducible from any
    engine or the driver, unlike xxhash64/F.hash)."""
    return F.pmod(
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def _bucket_of(term: str, n_buckets: int) -> int:
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def _full_postings(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, term, tf, dl) over ALL terms — retrieval.term_postings
    without the query filter (an index cannot know its queries)."""
    toks = parallelize_narrow(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text_col)).cast("long").alias("dl"),
        F.explode(tokens_col(text_col)).alias("tok"),
    )
    return (
        toks.select("doc_id", "dl", F.lower("tok").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )


def _write_sidecars(spark: SparkSession, path: str, n_buckets: int) -> None:
    """Derive df + corpus scalars FROM the on-disk postings and write
    them next to the data. Runs at build and after every append, so
    idf is always exact for the index's current contents. The df table
    reuses the postings' bucket layout for pruned probe reads; the
    meta row also pins n_buckets — probing with the wrong bucket count
    would silently read the wrong partitions."""
    post = spark.read.parquet(f"{path}/postings")
    df_per_term = post.groupBy("term").agg(F.count("*").alias("df"))
    (
        df_per_term.withColumn("bucket", _bucket_col(F.col("term"), n_buckets))
        .repartition("bucket")
        .sortWithinPartitions("term")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(f"{path}/terms")
    )
    # N counts DOCUMENTS (dl rides per posting; distinct doc_id), and
    # avgdl averages one dl per doc — first() per doc_id, exactly the
    # scalars bm25_topk derives from the corpus
    doc_stats = post.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    meta = doc_stats.select(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.lit(n_buckets).alias("n_buckets"),
    )
    meta.coalesce(1).write.mode("overwrite").parquet(f"{path}/_meta")


def write_text_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize `docs` as a BM25 postings index at `path`.

    Layout: ``path/postings/batch_id=N/bucket=M`` — the initial build
    is batch 0; every append owns its own ``batch_id`` directory, so a
    retried append REPLACES its partial attempt instead of duplicating
    postings (the neardup_stream idempotency pattern). Probes filter
    on ``bucket`` (md5 of term mod `n_buckets`) — a second-level
    partition prunes exactly like a first-level one — and row groups
    within a bucket are term-sorted for footer-stats skipping.
    ``path/terms`` carries the per-term df under a plain bucket
    layout (rebuilt whole on every append — it is derived, tiny, and
    overwrite-idempotent); ``path/_meta`` the corpus scalars. One
    tokenize pass + the partitioned write's routing shuffle; documents
    never move again.
    """
    _write_postings_batch(docs, path, 0, n_buckets, id_col, text_col)
    _write_sidecars(docs.sparkSession, path, n_buckets)


def _write_postings_batch(
    docs: DataFrame,
    path: str,
    batch_id: int,
    n_buckets: int,
    id_col: str,
    text_col: str,
) -> None:
    post = _full_postings(docs, id_col, text_col)
    (
        post.withColumn("bucket", _bucket_col(F.col("term"), n_buckets))
        .repartition("bucket")
        .sortWithinPartitions("term")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(f"{path}/postings/batch_id={batch_id}")
    )


def append_to_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_id: int | None = None,
) -> None:
    """Add a batch of new documents to an existing index — the
    ingest-time twin of `ann_index.append_to_ivf_index`.

    The batch's postings are tokenized with the same pipeline and
    appended under the index's stored bucket count (read from _meta —
    a caller-supplied bucket count could silently split terms across
    incompatible partitions). The df/meta sidecars are then rebuilt
    from the merged postings: a partial/final count over the INDEX,
    never a corpus rescan, so the cost is proportional to the index's
    postings, and idf stays exact (an index serving stale df would
    drift from `bm25_topk` parity batch after batch).

    Batches must be DISJOINT from already-indexed documents — route
    ingest through the idempotency gate (operators/ingest.py), exactly
    as the ledger write path does: re-appending a document lands its
    postings twice, and every probe then double-counts its tf and
    inflates N. A crash between the postings append and the sidecar
    rebuild leaves df/meta stale for the new batch only; re-running
    the sidecar rebuild (or the next successful append) repairs them,
    since sidecars are always derived from the on-disk postings.

    `batch_id` names the directory this append owns
    (``postings/batch_id=N``, written with overwrite — a RETRIED
    append replaces its own partial attempt instead of duplicating
    postings, which is what makes the streaming wrapper's
    at-least-once foreachBatch exactly-once in effect). None (the
    batch/CLI case) allocates max existing + 1.
    """
    spark = docs.sparkSession
    meta = spark.read.parquet(f"{path}/_meta").first()
    if meta is None:
        raise ValueError(f"index at {path} has an empty _meta sidecar")
    n_buckets = int(meta["n_buckets"])
    if batch_id is None:
        existing = spark.read.parquet(f"{path}/postings").select(
            F.max("batch_id").alias("m")
        ).first()["m"]
        batch_id = int(existing) + 1
    _write_postings_batch(docs, path, batch_id, n_buckets, id_col, text_col)
    _write_sidecars(spark, path, n_buckets)


def bm25_search_indexed(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for `query_terms` from a materialized index.

    Bucket routing happens on the driver (md5 of each query term), so
    the postings scan carries a literal `bucket IN (...)` partition
    predicate plus a `term IN (...)` data filter that parquet footer
    stats satisfy per row group (partitions are term-sorted). The df
    lookup reads the same buckets of the tiny terms table and
    broadcasts; N/avgdl come from the 1-row _meta. Scores — and the
    (score desc, doc_id asc) top-k — equal `retrieval.bm25_topk` on
    the same corpus exactly.
    """
    from .retrieval import _bm25_rank_topk

    meta = spark.read.parquet(f"{path}/_meta").first()
    if meta is None:
        raise ValueError(f"index at {path} has an empty _meta sidecar")
    n_buckets = int(meta["n_buckets"])
    terms = sorted({t.lower() for t in query_terms})
    buckets = sorted({_bucket_of(t, n_buckets) for t in terms})

    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("doc_id", "term", "tf", "dl")
    )
    df_per_term = (
        spark.read.parquet(f"{path}/terms")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("term", "df")
    )
    stats = spark.createDataFrame(
        [(int(meta["n_docs"]), float(meta["avgdl"]))], "n_docs long, avgdl double"
    )
    return _bm25_rank_topk(postings, df_per_term, stats, k, k1, b)


def compact_text_index(spark: SparkSession, path: str) -> int:
    """Fold every batch's postings into a single batch_id=0 tree — the
    small-file countermeasure for a long-running streaming index
    (thousands of per-batch directories make probes pay file-open and
    listing overhead that row-group skipping cannot recover).

    Rewrite-then-swap via the ledger's ATOMIC directory exchange
    (operators/ledger._exchange_dirs): a concurrent probe lists the
    complete old tree or the complete new one. Postings content is
    preserved row-for-row (same bucket routing, term-sorted within
    partitions), so probe results are IDENTICAL across the cutover and
    the sidecars stay valid without a rebuild — compaction moves
    bytes, never meaning. Returns the number of postings rows.
    """
    import shutil

    from .ledger import _exchange_dirs

    meta = spark.read.parquet(f"{path}/_meta").first()
    if meta is None:
        raise ValueError(f"index at {path} has an empty _meta sidecar")
    n_buckets = int(meta["n_buckets"])
    post = spark.read.parquet(f"{path}/postings").select(
        "doc_id", "term", "tf", "dl", "bucket"
    )
    tmp = path.rstrip("/") + "/postings.compact.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        post.repartition("bucket")
        .sortWithinPartitions("term")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(f"{tmp}/batch_id=0")
    )
    n = spark.read.parquet(tmp).count()
    _exchange_dirs(f"{path}/postings", tmp)
    shutil.rmtree(tmp, ignore_errors=True)
    return n

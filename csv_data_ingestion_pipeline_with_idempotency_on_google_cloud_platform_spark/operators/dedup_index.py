"""Incremental near-dup: a materialized MinHash band index.

`dedup.minhash_lsh_candidates` is the one-shot formulation — right for
deduplicating a corpus against itself, wrong for OPERATING a corpus:
at 100 TB you cannot re-signature ten billion historical documents
every time an ingest batch of a few million arrives. The production
shape is an index you build once and probe incrementally:

- `write_minhash_index`: signature fold (narrow, zero-shuffle — see
  `dedup.minhash_signatures`) → band entries → parquet partitioned by
  `band_id`. Historical vectors never move again.
- `probe_minhash_index`: signature the NEW batch only, then join the
  index with the batch side BROADCAST. The index is the streamed probe
  side of a BroadcastHashJoin — it is scanned, never shuffled
  (plan-pinned in tests/test_dedup_index.py); per-batch cost is one
  index scan + |batch| signature folds, independent of how the index
  got big. Candidates are verified with the same agreeing-positions
  Jaccard estimate as the self-join path.
- `append_to_minhash_index`: the accepted batch's entries land in the
  same layout (`mode=append`), so the index stays current without
  rewriting history. (Partitioning by `band_id` keeps appends to
  `bands` directories; small-file accretion is handled the same way
  as any streaming sink — `sources.layout.compact_files` per
  partition.)

Batch-internal duplicates are the existing self-join
(`minhash_lsh_candidates` on the batch alone — small); a full ingest
gate runs both and unions the drop sets.

This mirrors at the near-dup level what the reference's ledger does at
the exact level: persistent state consulted per batch
(main.py:52-58), not recomputed from history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_PERM,
    estimate_jaccard_col,
    minhash_band_entries,
    minhash_signatures,
)


def write_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    mode: str = "overwrite",
) -> None:
    """Materialize the corpus's LSH band entries at `path`.

    The LSH parameters are persisted in a `_meta` sidecar (underscore
    prefix: invisible to data-path listing) — probing with different
    parameters than the index was built with produces band hashes that
    never collide and silently reports zero near-dups, so the probe
    reads its parameters from the index itself.
    """
    if mode == "append":
        # an append with different LSH parameters than the index was
        # built with writes entries whose band hashes can never collide
        # with the existing ones — corrupting the index silently. The
        # sidecar is authoritative: validate before touching anything.
        from pyspark.errors import AnalysisException

        try:
            m = docs.sparkSession.read.parquet(f"{path}/_meta").collect()[0]
            stored = (m["num_perm"], m["bands"], m["shingle_n"])
            if stored != (num_perm, bands, shingle_n):
                raise ValueError(
                    f"index at {path} was built with (num_perm, bands, "
                    f"shingle_n)={stored}; refusing to append with "
                    f"{(num_perm, bands, shingle_n)}"
                )
        except AnalysisException as ex:
            # ONLY the missing-sidecar case may pass (pre-sidecar
            # index: caller params become the record). Any other
            # analysis error — a transiently unreadable sidecar,
            # corrupt footers — must fail the append loudly: skipping
            # validation and then re-stamping _meta with the caller's
            # params would let a mismatched append corrupt the index
            # and mark it consistent. Mirrors streaming/_gate_batch.
            msg = str(ex)
            if (
                "PATH_NOT_FOUND" not in msg
                and "UNABLE_TO_INFER_SCHEMA" not in msg
            ):
                raise
        except IndexError:
            pass  # sidecar dir exists but holds zero rows: no record
    sigs = minhash_signatures(docs, id_col, text_col, num_perm, shingle_n)
    entries = minhash_band_entries(sigs, num_perm, bands, id_col=id_col)
    # cluster each band partition by band_hash and write a parquet
    # bloom filter on it: probes push the batch's band hashes down as
    # an In filter, so tight min/max runs + bloom row-group tests make
    # the probe scan skip most of the index instead of reading it all
    (
        entries.sortWithinPartitions("band_id", "band_hash")
        .write.partitionBy("band_id")
        .option("parquet.bloom.filter.enabled#band_hash", "true")
        .mode(mode)
        .parquet(path)
    )
    docs.sparkSession.createDataFrame(
        [(num_perm, bands, shingle_n)], "num_perm int, bands int, shingle_n int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_meta")


def append_to_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    mode: str = "append",
) -> None:
    """Add an accepted batch's band entries to an existing index.

    Pass mode="overwrite" with a per-batch subdirectory for idempotent
    at-least-once commits (streaming/neardup_stream.py does this)."""
    write_minhash_index(
        docs, path, id_col, text_col, num_perm, bands, shingle_n, mode=mode
    )


_PUSHDOWN_MAX_HASHES = 300


def probe_minhash_index(
    new_docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    min_est_jaccard: float = 0.5,
    shingle_n: int = 3,
    max_index_bucket_size: int | None = None,
) -> DataFrame:
    """(id_new, id_corpus, est_jaccard): near-dups of the new batch
    against the indexed corpus.

    The batch's band entries are broadcast (an ingest batch is small
    relative to the corpus by definition); the index is the streamed
    side — one scan, zero index shuffle. Docs present in both (same
    id) are not reported against themselves. Pairs are scored and
    thresholded BEFORE the dedup shuffle (an est_jaccard is identical
    on every colliding band, so filter-then-distinct equals
    distinct-then-filter and sub-threshold pairs drop map-side).

    `max_index_bucket_size` guards the boilerplate-corpus failure
    mode: a (band, hash) bucket holding thousands of near-identical
    index entries multiplies every batch hit by the bucket size
    (measured: a 100k-doc corpus with only 20 distinct texts turned a
    sub-second probe into 33 s and OOMed at 1M). With the cap, buckets
    larger than the cap are excluded from matching at the cost of one
    counting aggregation over the index scan — pairs that also
    collide in a calmer band are still found, the same recall trade as
    `dedup.minhash_lsh_candidates`'s hot-bucket cap. A steady-state
    deployment would materialize bucket counts at write/append time
    and skip the extra aggregation.

    LSH parameters come from the index's `_meta` sidecar when present
    (see write_minhash_index) — the caller's num_perm/bands/shingle_n
    are a fallback for pre-sidecar indexes only.
    """
    from pyspark.errors import AnalysisException

    spark: SparkSession = new_docs.sparkSession
    for meta_glob in (f"{index_path}/_meta", f"{index_path}/*/_meta"):
        try:
            m = spark.read.parquet(meta_glob).collect()[0]
            num_perm, bands, shingle_n = m["num_perm"], m["bands"], m["shingle_n"]
            break
        except (AnalysisException, IndexError):
            continue
    sigs = minhash_signatures(new_docs, id_col, text_col, num_perm, shingle_n)
    new_entries = (
        minhash_band_entries(sigs, num_perm, bands, id_col=id_col)
        .withColumnRenamed("id", "id_new")
        .withColumnRenamed("sig", "sig_new")
    )
    # SMALL probes (the online "is this new doc a dup" path) push
    # their band-hash set into the index scan as a literal In
    # predicate: row-group min/max + bloom skipping over the
    # band_hash-clustered layout means the scan reads a handful of row
    # groups, not the index. Capped at _PUSHDOWN_MAX_HASHES — parquet
    # evaluates a literal In as a recursively built predicate tree and
    # a thousands-deep tree overflows the executor stack (measured at
    # 3200 values); a bulk batch above the cap amortizes one full
    # index scan across all its docs instead, which is the cheaper
    # shape there anyway.
    batch_hashes = [
        r["band_hash"] for r in new_entries.select("band_hash").distinct().collect()
    ]
    if not batch_hashes:  # empty batch (e.g. a retried empty micro-batch)
        return spark.createDataFrame(
            [], "id_new long, id_corpus long, est_jaccard double"
        )
    idx = spark.read.parquet(index_path)
    if len(batch_hashes) <= _PUSHDOWN_MAX_HASHES:
        idx = idx.filter(F.col("band_hash").isin(batch_hashes))
    if max_index_bucket_size is not None:
        hot = (
            idx.groupBy("band_id", "band_hash")
            .count()
            .filter(F.col("count") > max_index_bucket_size)
            .select("band_id", "band_hash")
        )
        idx = idx.join(hot, ["band_id", "band_hash"], "left_anti")
    matches = idx.join(
        F.broadcast(new_entries),
        on=[
            idx["band_id"] == new_entries["band_id"],
            idx["band_hash"] == new_entries["band_hash"],
            idx["id"] != new_entries["id_new"],
        ],
    ).select(
        F.col("id_new"),
        idx["id"].alias("id_corpus"),
        estimate_jaccard_col(F.col("sig_new"), idx["sig"], num_perm).alias(
            "est_jaccard"
        ),
    )
    return (
        matches.filter(F.col("est_jaccard") >= min_est_jaccard)
        .dropDuplicates(["id_new", "id_corpus"])
        .select("id_new", "id_corpus", F.round("est_jaccard", 4).alias("est_jaccard"))
    )

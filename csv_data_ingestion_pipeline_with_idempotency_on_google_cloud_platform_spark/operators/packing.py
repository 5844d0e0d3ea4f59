"""Sequence packing — assign documents to fixed-budget training packs.

LLM pretraining consumes fixed-length token windows; feeding one short
document per window wastes compute, so pipelines pack multiple
documents per window. Exact greedy bin-packing is inherently
sequential; the scalable, deterministic formulation used here is
*offset packing*: within each partition stream, order documents by a
stable key, take the exclusive running total of their cost, and assign
``pack_id = floor(offset / budget)``. Properties:

- deterministic and engine-independent (pure window expression — the
  oracle twin is the identical ANSI window function);
- each pack's total overshoots the budget by less than one document's
  cost (documents straddle pack boundaries exactly once), matching the
  "pack then split at window boundary" convention of training loaders;
- scale: the window is partitioned by a stream column (language,
  source shard, hash bucket — caller's choice), so no global sort:
  each partition packs independently and in parallel. At 100 TB, use a
  hash-bucket stream column with ~10k buckets: per-bucket sequential
  scan after one shuffle, identical plan shape to any windowed agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    cost_col: str,
    budget: int,
    stream_col: str,
    order_col: str = "doc_id",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Add ``pack_col``: the 0-based pack index within each
    ``stream_col`` group, packing by cumulative ``cost_col`` offset
    against ``budget``. Ordering within a stream follows ``order_col``
    (must be unique per stream for determinism)."""
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(cost_col).over(w), F.lit(0))
    return docs.withColumn(
        pack_col, F.floor(offset / F.lit(float(budget))).cast("long")
    )


def pack_stats(
    packed: DataFrame,
    cost_col: str,
    stream_col: str,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Per-pack utilization summary: document count, total cost."""
    return packed.groupBy(stream_col, pack_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(cost_col).alias("total_cost"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int = 1000,
    overlap: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split long documents into fixed-size character chunks with
    overlap — the context-window primitive of pretraining and RAG
    ingestion. Chunk k covers [k·stride, k·stride + chunk_chars) with
    stride = chunk_chars − overlap; the final chunk is the remainder
    (never empty for non-empty docs; empty docs yield one empty chunk,
    preserving doc count under a grouped re-assembly).

    Pure row expansion — sequence → transform(substring) → posexplode —
    so the pass is narrow, partition-parallel, and shuffle-free at any
    scale. Returns (id_col, chunk_idx, chunk_start, chunk, n_chunks).
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    t = F.col(text_col)
    n = F.length(t)
    # number of stride steps whose window start lies inside the text
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)).cast("int"),
        F.lit(1),
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda k: k * stride
    )
    chunks = F.transform(starts, lambda s: F.substring(t, s + 1, chunk_chars))
    return (
        docs.select(
            F.col(id_col),
            n_chunks.alias("n_chunks"),
            F.posexplode(chunks).alias("chunk_idx", "chunk"),
        )
        .select(
            id_col,
            "chunk_idx",
            (F.col("chunk_idx") * stride).alias("chunk_start"),
            "chunk",
            "n_chunks",
        )
    )


def assign_global_ids(
    df: DataFrame,
    order_col: str,
    num_partitions: int | None = None,
    id_col: str = "row_id",
) -> DataFrame:
    """Contiguous 0-based row IDs in ``order_col`` order WITHOUT a
    global sort — the sample-index primitive of training loaders
    (shard manifests, token-offset tables, resumable iteration).

    Semantically identical to ``row_number() over (order by order_col)
    - 1``, but that plan moves every row through one partition. The
    scalable formulation:

    1. range-partition by ``order_col``, sort within partitions, and
       materialize ONCE (``localCheckpoint``). The materialization is
       what makes the scheme sound: range-exchange bounds are sampled
       per-execution (the sample seed involves the RDD id), so running
       the count job and the assignment job against two independent
       executions could place boundary rows in different partitions
       and corrupt the offsets. Both jobs below read the same
       checkpointed blocks. Project down to needed columns before
       calling — the materialization holds them.
    2. the within-partition rank comes free from
       ``monotonically_increasing_id``'s contract (partition_id << 33
       + per-partition record counter, counting in the sorted
       iteration order) — no window, so no second exchange of the
       data; only the per-partition counts (``num_partitions`` longs,
       legitimate driver state like k-means centroids) cross the wire
       to become broadcast exclusive-prefix-sum offsets.

    ``order_col`` values must be unique for a deterministic assignment;
    the output is identical across calls regardless of how the range
    bounds were sampled (bounds affect balance, never order).

    ``num_partitions`` defaults to the cluster's default parallelism
    (r9): partition count only affects balance, and the earlier
    constant 256 was wrong in both directions — 8 stages x 256 tasks of
    scheduler overhead on a laptop-scale input, too few range buckets
    for a 100 TB sort spread over thousands of cores (pass it
    explicitly when the input's size is known to need more).

    Storage lifecycle: the checkpointed blocks live as long as the
    RETURNED DataFrame (its plan reads them) and are reclaimed by the
    ContextCleaner once the caller drops the last reference — so each
    call holds one materialized copy of the projected input for the
    lifetime of its result, and repeated calls whose results are kept
    accumulate storage. For a persistent assignment, write the result
    to parquet and drop the DataFrame; don't hold many live results.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    p = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    counts = p.groupBy("__pid").count().orderBy("__pid").collect()
    offsets, running = {}, 0
    for r in counts:
        offsets[r["__pid"]] = running
        running += r["count"]
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    local_rank = F.col("__mid") - F.shiftleft(F.col("__pid").cast("long"), 33)
    return (
        p.withColumn(id_col, (off[F.col("__pid")] + local_rank).cast("bigint"))
        .drop("__pid", "__mid")
    )

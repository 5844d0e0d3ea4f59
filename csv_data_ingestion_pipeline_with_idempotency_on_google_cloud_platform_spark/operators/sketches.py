"""Frequent-items sketching: Misra-Gries heavy hitters over corpus
terms — the third classical mergeable sketch alongside HLL distinct
counts and GK quantiles (plans/queries.py:approx_distinct /
approx_quantiles).

Why a sketch when `top_terms` already ranks exactly: the exact path
shuffles every distinct term. At 100 TB of web text the term universe
is billions of mostly-once strings — the shuffle is dominated by the
long tail that can never be a top term. Misra-Gries keeps k counters
per partition (k terms + counts, bytes), so the only thing that ever
crosses the wire is num_partitions × k candidate rows, independent of
corpus or vocabulary size.

Guarantees (standard MG, summed over partition summaries):
- est_count <= true_count  (counts are only ever undercounted)
- true_count - est_count <= max_undercount, where max_undercount is
  the exact total decrement mass Σ_p (n_p - Σ c_p)/(k+1)
- every term with true_count > max_undercount is present — so with
  uniform partitions any term above N/(k+1) in frequency survives.

Reference scope: extension X9/X11 (SURVEY.md §2b) — the reference has
no analytics surface at all; this generalizes its per-file counting
(main.py:120-137) the same way the other sketches do.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from ..utils import parallelize_narrow

_SUMMARY_DDL = "term STRING, c BIGINT, pid INT, n_part BIGINT, sum_c BIGINT"


def _mg_partition(k: int):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counters: dict[str, int] = {}
        n = 0
        for pdf in it:
            for t in pdf["term"]:
                n += 1
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        sum_c = sum(counters.values())
        # a term=NULL marker row per partition carries (n_part, sum_c)
        # even when every counter cancelled to zero — without it an
        # all-tail partition's decrement mass would vanish from the
        # error bound
        yield pd.DataFrame(
            {
                "term": [None] + list(counters),
                "c": [0] + list(counters.values()),
                "pid": pid,
                "n_part": n,
                "sum_c": sum_c,
            }
        )

    return fn


def frequent_terms(
    docs: DataFrame,
    k: int = 64,
    text_col: str = "text",
    min_share: float | None = None,
) -> DataFrame:
    """(term, est_count, max_undercount): Misra-Gries heavy-hitter
    candidates over lowercased whitespace terms.

    One narrow pass (tokenize → per-partition sketch via Arrow-batched
    mapInPandas) + one tiny shuffle of ≤ partitions×k summary rows.
    `min_share` keeps only terms that could still hold that share of
    total occurrences (filter on est + max_undercount — sound: no
    false negatives; verify survivors exactly if exactness matters).
    """
    terms = parallelize_narrow(
        docs.select(F.explode(tokens_col(text_col)).alias("t"))
    ).select(F.lower("t").alias("term"))
    # materialize the summaries ONCE (partitions x (k+1) tiny rows):
    # both the error-bound branch and the per-term estimate branch
    # hang off this subtree, and mapInPandas is not an exchange, so
    # without the checkpoint the full tokenize+sketch corpus pass
    # would execute twice
    summaries = terms.mapInPandas(
        _mg_partition(k), schema=_SUMMARY_DDL
    ).localCheckpoint(eager=True)

    # exact total decrement mass: each MG decrement round at k full
    # counters absorbs k+1 occurrences, so a partition that processed
    # n_p rows and retained sum_c counts performed (n_p-sum_c)/(k+1)
    # rounds, each able to undercount any term by 1
    bound = (
        summaries.select("pid", "n_part", "sum_c")
        .distinct()
        .agg(
            F.floor(
                F.sum((F.col("n_part") - F.col("sum_c")) / F.lit(k + 1))
            ).cast("bigint").alias("max_undercount"),
            F.sum("n_part").cast("bigint").alias("n_total"),
        )
    )
    est = (
        summaries.filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.sum("c").cast("bigint").alias("est_count"))
    )
    out = est.crossJoin(F.broadcast(bound))
    if min_share is not None:
        out = out.filter(
            F.col("est_count") + F.col("max_undercount")
            >= F.lit(min_share) * F.col("n_total")
        )
    return out.select("term", "est_count", "max_undercount")

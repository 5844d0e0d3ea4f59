"""Distributed BPE tokenizer training — the classic word-frequency
algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") expressed as Spark aggregations and JVM
array-fold expressions.

Training a subword vocabulary is a standard step of an LLM data
pipeline; the reference's per-file line processing (main.py:120-137)
has no counterpart, so this is a north-star extension like the rest
of the text stack.

Why this scales:

- Training runs on the WORD-FREQUENCY table, not the token stream:
  one map-side-combined ``groupBy(word).count()`` shuffle collapses
  the corpus to |distinct words| rows (Heaps' law: ~1M rows for a
  100 TB corpus — tiny), exactly like the classic implementation.
- Each merge iteration is two narrow passes over that table: an
  overlapping-adjacent-pair count (explode + weighted groupBy, map-
  side combined) and a greedy left-to-right merge applied as an
  ``F.aggregate`` fold over the symbol array — pure JVM expressions,
  zero Python in the loop.
- Driver state is the merge list only ((left, right) pairs — the
  learned artifact itself), the same legitimate-state shape as
  k-means centroids (similarity.py) and IVF cells (ann_index.py).
- Lineage is truncated with ``localCheckpoint`` every few merges so
  n_merges=1000 does not build a 1000-deep plan.

Encoding with a learned merge table (``apply_bpe``) is an
Arrow-batched mapInPandas with per-batch word memoization — the
standard fast path for per-row Python logic that built-ins cannot
express (ordered greedy merge application is inherently sequential).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_col

_EMPTY_SYMS = "CAST(array() AS ARRAY<STRING>)"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount) over whitespace tokens — the training table."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted overlapping adjacent-pair counts over (symbols, wcount).

    Single-symbol words contribute nothing (guarded: Spark's
    ``sequence(1, 0)`` would otherwise generate a DESCENDING range and
    fabricate pairs from nulls).
    """
    pairs = F.when(
        F.size("symbols") > 1,
        F.expr(
            "transform(sequence(1, size(symbols)-1), "
            "i -> struct(symbols[i-1] AS l, symbols[i] AS r))"
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRUCT<l: STRING, r: STRING>>)"))
    return (
        vocab.select(F.explode(pairs).alias("p"), "wcount")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("wcount").alias("pair_count"))
    )


def _merge_fold(left: str, right: str) -> F.Column:
    """Greedy left-to-right merge of the (left, right) symbol pair as a
    fold: matches the canonical implementation on overlapping runs
    ('aaa' + merge (a,a) → [aa, a])."""
    a, b = F.lit(left), F.lit(right)
    return F.aggregate(
        "symbols",
        F.expr(_EMPTY_SYMS),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(a, b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 5,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges; returns [(left, right,
    pair_count)] in merge order. Deterministic: ties break on the
    lexicographically smallest (left, right).

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (merging hapax pairs memorizes noise).
    """
    vocab = word_frequencies(docs, text_col).select(
        F.split("word", "").alias("symbols"), "wcount"
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < min_pair_count:
            break
        l, r, c = best[0]["l"], best[0]["r"], best[0]["pair_count"]
        merges.append((l, r, int(c)))
        vocab = vocab.select(_merge_fold(l, r).alias("symbols"), "wcount")
        if (i + 1) % checkpoint_every == 0:
            # truncate the fold-upon-fold lineage; superseded blocks are
            # reclaimed by the ContextCleaner once unreferenced
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def merge_table(
    spark: SparkSession, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """The learned artifact as a DataFrame: (rank, left, right,
    pair_count)."""
    return spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank int, left string, right string, pair_count bigint",
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_i = rk, i
        if best_rank is None:
            break
        # merge ALL occurrences of the best pair, left to right
        pair = (syms[best_i], syms[best_i + 1])
        out, i = [], 0
        while i < len(syms):
            if (
                i < len(syms) - 1
                and (syms[i], syms[i + 1]) == pair
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode ``text_col`` with a learned merge list: lowest-rank pair
    merges first (the standard BPE encoder), whitespace pre-split.

    Arrow-batched mapInPandas with per-batch word memoization — the
    merge loop is order-dependent, so this is the documented slow-path
    exception; the memo makes it O(|distinct words in batch|)."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    cols = docs.columns
    # build a NEW StructType — StructType.add mutates in place, which
    # would retroactively grow the input DataFrame's cached schema
    schema = StructType(
        list(docs.schema.fields)
        + [StructField(out_col, ArrayType(StringType()))]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                out: list[str] = []
                for w in (text or "").split():
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        memo[w] = enc
                    out.extend(enc)
                toks.append(out)
            pdf = pdf[cols].copy()
            pdf[out_col] = toks
            yield pdf

    return docs.mapInPandas(encode, schema)


# frozen literal merge table for the oracle-gated encode twin (X141):
# applied IN ORDER; each step replaces every non-overlapping
# left-to-right occurrence of the space-separated pair — the batch
# BPE-apply step with the merge list pinned, so both engines replay it
# with plain string replace
LITERAL_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("a", "n"),
    ("an", "d"),
    ("i", "n"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
]


def bpe_literal_encode(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BPE ENCODE with the merge list pinned to the LITERAL_MERGES
    table (round 9): the X121/X122 literal-synopsis trick applied to
    tokenization, closing the BPE family's oracle gap — the trained
    `bpe_merge_learn` (iterative pair counting, exact reference-impl
    parity in tests) stays rows-only; THIS is what the serving
    encoder executes once merges are frozen. Pure string algebra both
    engines replay byte-for-byte:

      1. lowercase each whitespace token, intersperse single spaces
         between characters (regexp_replace '(.)' → '$1 '), pad with
         one space either side;
      2. for each merge (a, b) in order: replace ' a b ' with ' ab ',
         TWICE (left-to-right non-overlapping, identical semantics in
         Spark `replace` and DuckDB `replace`; consecutive
         occurrences of a pair share the delimiting space, so one
         pass merges every other occurrence in a run — after it, each
         surviving occurrence is isolated with spaces on both sides
         and the second pass merges all of them, which equals the
         standard simultaneous-disjoint BPE merge step exactly);
      3. the piece count per word is the space-split size of the
         trimmed result.

    Scale shape: one narrow projection; per-word work rides a
    higher-order transform over the token array (JVM expressions, no
    explode of data-scale rows, no shuffle beyond the final per-doc
    projection — it IS per-doc). Output per document:
    (doc_id, n_words, n_symbols, n_pieces, merge_gain_milli) where
    n_symbols is the pre-merge character count over lowered tokens
    and merge_gain_milli = 1000·(n_symbols − n_pieces) div
    max(n_symbols, 1).
    """
    from ..utils import parallelize_narrow

    def pieces(w: F.Column) -> F.Column:
        s = F.concat(
            F.lit(" "),
            F.trim(F.regexp_replace(F.lower(w), "(.)", "$1 ")),
            F.lit(" "),
        )
        for a, b in LITERAL_MERGES:
            # twice: see docstring (adjacent-run delimiter sharing)
            s = F.replace(s, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
            s = F.replace(s, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
        return F.size(F.split(F.trim(s), " "))

    toks = tokens_col(text_col)
    n_words = F.size(toks).cast("long")
    n_symbols = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(F.lower(w)),
    )
    n_pieces = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc + pieces(w).cast("long"),
    )
    return (
        parallelize_narrow(docs)
        .select(
            F.col(id_col),
            n_words.alias("n_words"),
            n_symbols.alias("n_symbols"),
            n_pieces.alias("n_pieces"),
        )
        .select(
            id_col,
            "n_words",
            "n_symbols",
            "n_pieces",
            F.expr(
                "(1000 * (n_symbols - n_pieces)) div greatest(n_symbols, 1)"
            )
            .cast("long")
            .alias("merge_gain_milli"),
        )
    )

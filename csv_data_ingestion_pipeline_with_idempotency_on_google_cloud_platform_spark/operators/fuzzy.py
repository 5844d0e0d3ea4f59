"""Fuzzy string matching — SymSpell-style deletion-neighborhood
blocking with exact Levenshtein verification, as pure DataFrame ops.

The record-linkage / typo-mining primitive: find all string pairs
within edit distance 1 WITHOUT the O(n²) cross join. Completeness
argument (SymSpell, public algorithm): if lev(a,b) ≤ 1 then the
deletion neighborhoods {a} ∪ del₁(a) and {b} ∪ del₁(b) intersect —
equal-length pairs share the deletion at the differing position, and
insertion pairs satisfy a ∈ del₁(b). So candidates = strings sharing
ANY neighborhood key, then `F.levenshtein` (JVM) verifies exactly.

Scale shape: each string emits |s|+1 keys (narrow explode), candidate
pairs expand inside collected key buckets via the shared
`_bucket_pairs` path (one shuffle, hot-key cap), and verification is a
codegen'd per-pair expression. At 100 TB the key space is effectively
the vocabulary × average length — shuffle volume is keys, never pairs
across buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants_col(s: Column | str) -> Column:
    """The string plus every single-character deletion of it, distinct.
    Pure expression: transform over character positions."""
    c = F.col(s) if isinstance(s, str) else s
    dels = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1))),
        lambda i: F.concat(
            F.substring(c, F.lit(1), i - 1),
            c.substr(i + 1, F.length(c)),
        ),
    )
    return F.array_distinct(F.concat(F.array(c), dels))


def fuzzy_self_pairs(
    strings: DataFrame,
    col: str = "s",
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """All distinct string pairs within Levenshtein distance 1:
    (s_a, s_b, dist) with s_a < s_b. Input: one string per row in
    `col` (pre-distinct it — duplicates only inflate buckets)."""
    entries = strings.select(
        F.col(col).alias("id"),
        F.col(col).alias("v"),
        F.explode(deletion_variants_col(col)).alias("key"),
    )
    from .dedup import _bucket_pairs

    pairs = _bucket_pairs(entries, ["key"], ("id", "v"), max_bucket_size)
    return (
        pairs.select(
            F.col("id_a").alias("s_a"),
            F.col("id_b").alias("s_b"),
            F.levenshtein("pa", "pb").alias("dist"),
        )
        .filter(F.col("dist") <= 1)
        .filter(F.col("dist") > 0)
    )


def typo_candidates(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Typo mining over a corpus: edit-distance-1 pairs within the
    top-`vocab_size` vocabulary, annotated with both terms' counts —
    the classic signal for misspelling normalization (a rare term one
    edit from a frequent one). Returns (s_a, s_b, dist, n_a, n_b)."""
    from ..functions.text import tokens_col
    from .classify import _vocab_top_v

    toks = docs.select(F.explode(tokens_col(text_col)).alias("tok")).select(
        F.lower("tok").alias("term")
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    vocab = _vocab_top_v(counts, vocab_size)
    pairs = fuzzy_self_pairs(vocab.select(F.col("term").alias("s")))
    na = vocab.select(F.col("term").alias("s_a"), F.col("n").alias("n_a"))
    nb = vocab.select(F.col("term").alias("s_b"), F.col("n").alias("n_b"))
    return pairs.join(F.broadcast(na), "s_a").join(F.broadcast(nb), "s_b").select(
        "s_a", "s_b", "dist", "n_a", "n_b"
    )


def fuzzy_join(
    probe: DataFrame,
    canonical: DataFrame,
    probe_col: str,
    canon_col: str,
) -> DataFrame:
    """Two-table record linkage: match each probe string to every
    canonical string within edit distance 1 (exact matches included,
    dist 0). Returns (probe value, canonical value, dist) with columns
    named after the inputs.

    Same neighborhood-key blocking as fuzzy_self_pairs, but as a plain
    equi-join on the key: both sides emit |s|+1 keys, candidates are
    key-collisions, `F.levenshtein` verifies. Shuffle volume is keys;
    at scale the canonical side (a dictionary/gazetteer) is usually
    small enough that Catalyst broadcasts its exploded keys and the
    probe side never shuffles at all.
    """
    p = probe.select(F.col(probe_col).alias("__p")).distinct().select(
        "__p", F.explode(deletion_variants_col("__p")).alias("__key")
    )
    c = canonical.select(F.col(canon_col).alias("__c")).distinct().select(
        "__c", F.explode(deletion_variants_col("__c")).alias("__key")
    )
    return (
        p.join(c, "__key")
        .select("__p", "__c")
        .dropDuplicates(["__p", "__c"])
        .select(
            F.col("__p").alias(probe_col),
            F.col("__c").alias(canon_col),
            F.levenshtein("__p", "__c").alias("dist"),
        )
        .filter(F.col("dist") <= 1)
    )

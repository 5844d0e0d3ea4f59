"""Distributed quality/domain classifier — a fastText-style linear
text classifier trained and applied entirely as Spark aggregations.

This is the standard large-corpus curation move (CCNet / LLaMA / GPT-3
style): train a cheap linear classifier on token features against a
weak label (here: a document attribute such as language or source) and
score every document with it, keeping the high-scoring slice. The
model is binary Naive Bayes with Laplace smoothing over a capped
vocabulary, which makes both training and inference pure DataFrame
algebra:

- **Train** = one token-count shuffle (map-side combinable: shuffle
  volume is |distinct terms|, not |tokens|), a salted two-phase top-V
  rank to cap the vocabulary, and a 1-row totals aggregate. The model
  itself is the (term, weight) table — at most `vocab_size` rows, i.e.
  broadcast-sized at any corpus scale.
- **Score** = explode tokens → broadcast-join the weight table →
  per-doc sum. One shuffle keyed by doc_id; no Python in the loop.

Weights are stored as **milli-log-odds integers** (round(1000·logodds)
as bigint) so per-document scores are exact integer sums — immune to
floating-point summation-order differences across engines/partitions,
which keeps the query value-hash deterministic and DuckDB-oracle-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens_col

_SALT_BUCKETS = 32


def _vocab_top_v(counts: DataFrame, vocab_size: int) -> DataFrame:
    """Global top-V terms by (n desc, term asc) without a single-task
    global sort over the whole vocabulary: rank within hash-salt
    buckets first (a global top-V term is necessarily in its bucket's
    top-V), then rank the ≤ V×buckets survivors once."""
    salted = counts.withColumn("__salt", F.pmod(F.hash("term"), F.lit(_SALT_BUCKETS)))
    w_local = Window.partitionBy("__salt").orderBy(F.desc("n"), F.asc("term"))
    survivors = (
        salted.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= vocab_size)
        .drop("__lr", "__salt")
    )
    # phase 2 over ≤ V×buckets rows as orderBy+limit → TakeOrderedAndProject
    # (per-partition heaps + driver merge), not a single-partition window
    return survivors.orderBy(F.desc("n"), F.asc("term")).limit(vocab_size)


def train_token_weights(
    docs: DataFrame,
    label_col: str = "lang",
    positive: str = "en",
    vocab_size: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Train the classifier: per-term milli-log-odds of the positive
    class. Returns (term, c_pos, c_neg, weight_milli) with at most
    `vocab_size` rows.

    Smoothing denominators use the *realized* vocabulary size (which
    can be < vocab_size on small corpora) so the formula is exactly
    reproducible from the weight table alone. A NULL label counts as
    negative (an unlabeled document is not a positive example), which
    also keeps the DuckDB oracle's CASE-ELSE arithmetic exact.
    """
    is_pos = F.coalesce(
        (F.col(label_col) == F.lit(positive)).cast("long"), F.lit(0)
    )
    toks = docs.select(
        is_pos.alias("is_pos"),
        F.explode(tokens_col(text_col)).alias("tok"),
    ).select("is_pos", F.lower("tok").alias("term"))
    counts = toks.groupBy("term").agg(
        F.sum("is_pos").alias("c_pos"),
        F.sum(F.lit(1) - F.col("is_pos")).alias("c_neg"),
        F.count(F.lit(1)).alias("n"),
    )
    vocab = _vocab_top_v(counts, vocab_size)
    totals = vocab.agg(
        F.sum("c_pos").alias("pos_total"),
        F.sum("c_neg").alias("neg_total"),
        F.count(F.lit(1)).alias("n_vocab"),
    )
    # totals is 1 row; the crossJoin broadcasts it as a literal-like frame
    return (
        vocab.crossJoin(F.broadcast(totals))
        .select(
            "term",
            "c_pos",
            "c_neg",
            F.round(
                F.lit(1000.0)
                * (
                    F.log((F.col("c_pos") + 1.0) / (F.col("pos_total") + F.col("n_vocab")))
                    - F.log((F.col("c_neg") + 1.0) / (F.col("neg_total") + F.col("n_vocab")))
                )
            )
            .cast("bigint")
            .alias("weight_milli"),
        )
    )


def prior_milli(
    docs: DataFrame, label_col: str = "lang", positive: str = "en"
) -> DataFrame:
    """1-row class-prior log-odds in milli units:
    round(1000·(ln p⁺ − ln p⁻)) with add-one smoothing on the class
    counts — a single-class corpus yields a large finite prior instead
    of ln(0) = NULL cascading into every document score. NULL labels
    count as negative, as in train_token_weights."""
    is_pos = F.coalesce(
        (F.col(label_col) == F.lit(positive)).cast("long"), F.lit(0)
    )
    n = F.count(F.lit(1)).cast("double")
    return docs.agg(
        F.round(
            F.lit(1000.0)
            * (
                F.log((F.sum(is_pos) + 1.0) / (n + 2.0))
                - F.log((F.sum(F.lit(1) - is_pos) + 1.0) / (n + 2.0))
            )
        )
        .cast("bigint")
        .alias("prior_milli")
    )


def score_documents(
    docs: DataFrame,
    weights: DataFrame,
    prior: DataFrame,
    label_col: str = "lang",
    positive: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document: prior + Σ weight_milli over its tokens
    (with multiplicity; out-of-vocabulary tokens contribute 0).

    Returns (id, score_milli, pred_pos ∈ {0,1}, is_pos ∈ {0,1}). The
    weight table is ≤ vocab_size rows → broadcast; the only shuffle is
    the per-doc sum keyed by id.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
    ).select(id_col, F.lower("tok").alias("term"))
    doc_scores = (
        toks.join(F.broadcast(weights.select("term", "weight_milli")), "term")
        .groupBy(id_col)
        .agg(F.sum("weight_milli").alias("tok_score"))
    )
    return (
        docs.select(
            id_col,
            F.coalesce(
                (F.col(label_col) == F.lit(positive)).cast("int"), F.lit(0)
            ).alias("is_pos"),
        )
        .join(doc_scores, id_col, "left")
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            (F.col("prior_milli") + F.coalesce(F.col("tok_score"), F.lit(0)))
            .cast("bigint")
            .alias("score_milli"),
            (
                (F.col("prior_milli") + F.coalesce(F.col("tok_score"), F.lit(0))) > 0
            )
            .cast("int")
            .alias("pred_pos"),
            "is_pos",
        )
    )


def classify_corpus(
    docs: DataFrame,
    label_col: str = "lang",
    positive: str = "en",
    vocab_size: int = 4096,
) -> DataFrame:
    """Train-and-score in one plan (self-training on the weak label,
    exactly how corpus-quality classifiers are bootstrapped)."""
    weights = train_token_weights(
        docs, label_col=label_col, positive=positive, vocab_size=vocab_size
    )
    prior = prior_milli(docs, label_col=label_col, positive=positive)
    return score_documents(
        docs, weights, prior, label_col=label_col, positive=positive
    )

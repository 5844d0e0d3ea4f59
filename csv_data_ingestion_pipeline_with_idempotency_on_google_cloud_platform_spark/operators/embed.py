"""Feature-hashed document embeddings — the hashing-trick vectorizer
(Weinberger et al., 2009) as pure column expressions.

Gives every document a dense vector WITHOUT a model or media libs:
each token hashes to a bucket and a sign, the vector is the signed
bucket counts. That is exactly the classic sparse bag-of-words →
fixed-dim projection used for cheap clustering / dedup / retrieval
fallbacks, and it bridges the `documents` table into every
embedding-family operator here (semantic_dedup, topk_cosine, IVF)
with no external dependency.

Determinism/portability: hashing is md5-hex based (the same
engine-independent idiom as hash_split / weighted_sample), weights are
exact integer sums — no float accumulation order anywhere, so results
value-hash identically across engines and sessions. At the default
dim=16 the bucket is ONE hex digit and the sign the parity of the
next, which keeps the DuckDB oracle a pair of substring expressions.

Scale shape: tokenize → explode is narrow; the only shuffles are the
two map-side-combinable groupBys keyed by (doc, bucket) then doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_col

_EVEN_HEX = "02468ace"


def _bucket_sign(tok, dim: int):
    """(bucket, sign) columns for a token column. dim=16 uses single
    hex digits (oracle-portable); other dims use a 6-hex-digit conv
    modulo dim (Spark-side only — conv has no cheap DuckDB twin)."""
    h = F.md5(tok)
    if dim == 16:
        bucket = F.conv(F.substring(h, 1, 1), 16, 10).cast("int")
    else:
        # conv returns a STRING; cast before the modulo so the bucket is
        # integer arithmetic, not a string→double coercion
        bucket = (F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % dim).cast(
            "int"
        )
    sign = F.when(
        F.substring(h, 7 if dim != 16 else 2, 1).isin(*_EVEN_HEX), F.lit(1)
    ).otherwise(F.lit(-1))
    return bucket, sign


def hash_embed_sparse(
    docs: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sparse form: (id, dim, weight) rows for the non-zero buckets,
    weight = Σ sign over the document's tokens (with multiplicity).
    Exact integers — the oracle-checked surface."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
    ).select(id_col, F.lower("tok").alias("term"))
    bucket, sign = _bucket_sign(F.col("term"), dim)
    return (
        toks.select(id_col, bucket.alias("dim"), sign.alias("s"))
        .groupBy(id_col, "dim")
        .agg(F.sum("s").cast("bigint").alias("weight"))
        .filter(F.col("weight") != 0)
    )


def hash_embed(
    docs: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dense form: (id, embedding array<double> of length `dim`) —
    the densified sparse weights, ready for the embedding-family
    operators (cosine top-k, semantic_dedup, IVF indexing). Documents
    whose text yields no tokens embed as the zero vector."""
    sparse = hash_embed_sparse(docs, dim, id_col, text_col)
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    dense = (
        sparse.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("dim", "weight"))
            ).alias("m")
        )
        .select(
            id_col,
            F.transform(
                dims, lambda d: F.coalesce(F.col("m")[d], F.lit(0)).cast("double")
            ).alias("embedding"),
        )
    )
    zero = F.transform(dims, lambda d: F.lit(0.0))
    return (
        docs.select(id_col)
        .join(dense, id_col, "left")
        .select(id_col, F.coalesce("embedding", zero).alias("embedding"))
    )


def truncate_embeddings(
    emb: DataFrame,
    dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style embedding truncation: keep the first `dims`
    components and L2-renormalize — the storage/compute cut (e.g.
    64→16 = 4×) that MRL-trained embedding models are built to
    survive. Returns the truncated+renormalized vector plus the
    audit scalars retrieval tuning needs:

      norm_full      ‖v‖ of the original vector
      norm_trunc     ‖v[:dims]‖ before renormalization
      retained_frac  norm_trunc² / norm_full² — the energy kept; a
                     corpus-wide histogram of this column is the
                     "how low can dims go" decision input

    Pure codegen expressions (slice/transform/aggregate) — narrow,
    zero shuffle, no Python. Zero vectors renormalize to zero (not
    NaN) via the same clamped-norm rule as the cosine fold.
    """
    v = F.col(vec_col).cast("array<double>")
    t = F.slice(v, 1, dims)

    def l2(col):
        return F.sqrt(
            F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
        )

    norm_full = l2(v)
    norm_trunc = l2(t)
    safe = F.greatest(norm_trunc, F.lit(1e-12))
    return emb.select(
        F.col(id_col),
        F.transform(t, lambda x: x / safe).alias("embedding_trunc"),
        F.round(norm_full, 6).alias("norm_full"),
        F.round(norm_trunc, 6).alias("norm_trunc"),
        F.round(
            (norm_trunc * norm_trunc)
            / F.greatest(norm_full * norm_full, F.lit(1e-12)),
            6,
        ).alias("retained_frac"),
    )

"""Vector column expressions for similarity search — extension X3.

Pure higher-order-function expressions (`zip_with` + `aggregate`) over
`array<float>` embedding columns, computed in double precision JVM-side.
No UDFs: at 100 TB the dot products run inside codegen on every
executor with zero Python serialization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _as_double(col: Column | str) -> Column:
    return _c(col).cast("array<double>")


def dot_col(a: Column | str, b: Column | str) -> Column:
    """Sequential left-to-right double-precision dot product."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_col(a: Column | str) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_similarity_col(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; a zero-norm side yields 0.0 (not an error).

    Real corpora contain zero vectors (empty docs, padding rows), and
    under ANSI mode a bare division would fail the whole job on the
    first one — nullif + coalesce makes the expression total while
    keeping the happy path a single codegen division. 0.0 ranks zero
    vectors below every genuinely similar candidate in top-k and
    leaves them out of thresholded near-dup pairs, the behavior every
    caller here wants. A NULL input still propagates NULL (a missing
    embedding is corrupt data, not a dissimilar one — masking it as
    0.0 would hide pipeline bugs)."""
    denom = l2_norm_col(a) * l2_norm_col(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(
        dot_col(a, b) / F.nullif(denom, F.lit(0.0))
    )


def quantize_scale_col(a: Column | str) -> Column:
    """Per-vector symmetric int8 scale: max(|x|)/127 (0-vectors get
    scale 1.0 so they round-trip to zeros instead of dividing by 0)."""
    m = F.aggregate(
        _as_double(a), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    return F.when(m == 0.0, F.lit(1.0)).otherwise(m / F.lit(127.0))


def quantize_int8_col(a: Column | str, scale: Column) -> Column:
    """Symmetric int8 quantization: round-half-up(x/scale) as
    floor(x/s + 0.5) — spelled out so every engine agrees on .5 ties
    (JVM HALF_UP vs C round-half-away disagree on negatives)."""
    return F.transform(
        _as_double(a),
        lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"),
    )


def dequantize_col(q: Column | str, scale: Column) -> Column:
    """Back to float: q * scale. Reconstruction error per dim is
    <= scale/2 = max|x|/254 — enough to keep cosine top-k stable (see
    tests/test_vector_quantization.py for the recall bound)."""
    return F.transform(_c(q), lambda x: x.cast("double") * scale)

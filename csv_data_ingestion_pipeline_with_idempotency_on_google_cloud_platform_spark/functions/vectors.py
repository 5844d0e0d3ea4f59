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
    return dot_col(a, b) / (l2_norm_col(a) * l2_norm_col(b))

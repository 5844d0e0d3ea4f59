"""Skew-mitigation helpers for hot keys at scale.

AQE's skew-join splitting handles most cases automatically
(session.py enables it); these helpers cover the two patterns AQE
doesn't: skewed aggregations with expensive per-group state, and
salted broadcast-side replication for skewed joins when the build side
must stay small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation under key skew: pre-aggregate on
    (key, salt) — spreading a hot key over `salt_buckets` reducers —
    then combine per key.

    `aggs` run in the salted phase, `final_aggs` re-combine them; both
    lists must alias their outputs. Example::

        salted_agg(df, "k",
                   aggs=[F.count("*").alias("c")],
                   final_aggs=[F.sum("c").alias("c")])
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(*aggs)
    return partial.groupBy(key).agg(*final_aggs)


def salted_join_skewed_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Equality join where `big` has hot keys and `small` is broadcastable:
    salt the big side randomly, replicate the small side across all salt
    values (explode), join on (key, salt). Every hot key spreads over
    `salt_buckets` tasks; the small side grows by the same factor, which
    is fine because it broadcasts."""
    big_s = big.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_s.join(F.broadcast(small_r), on=[key, "__salt"]).drop("__salt")

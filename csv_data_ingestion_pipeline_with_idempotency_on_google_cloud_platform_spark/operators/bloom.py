"""Distributed Bloom-filter pre-filter for huge anti-joins.

The F2 idempotency gate (operators/ingest.py, reference main.py:52-58)
broadcasts the terminal upload_id set — right up to the point where a
100 M-key ledger (~3-4 GB of key strings, SCALE.md §ingest) no longer
fits in a broadcast. This module is the scale fallback: compress the key
set into an m-bit Bloom bitmap (~10 bits/key → 100 M keys ≈ 120 MB)
and run the exact anti-join only over the "maybe present" remnant.

Spark's own runtime bloom-join (`BloomFilterAggregate` /
`BloomFilterMightContain`) expresses the same idea but is not reachable
from the public Spark 4 function registry, so the sketch is built with
plain DataFrame ops:

- **build**: per key, k = `num_hashes` probe positions via
  Kirsch-Mitzenmacher double hashing (two `xxhash64` evaluations, JVM
  whole-stage codegen) → explode → `bit_or` aggregate into `(block,
  word)` 64-bit words. Map-side partial `bit_or` means the shuffle
  carries at most m/64 words per task, never the key set.
- **probe**: the word table is materialized into a driver numpy bitmap
  (m/8 bytes — sketch-sized by design, the same materialization Spark's
  runtime filter does) and broadcast; membership is tested by a
  vectorized Arrow-batched pandas UDF doing pure numpy indexing. The
  probe side never shuffles and never leaves its input partitioning.
- **correct**: Bloom filters have no false negatives, so
  `might_contain == false` rows are definitively new; the ~fpp false
  positives among the flagged rows are removed by an exact anti-join
  whose left side is now |matches| + fpp·|probe| rows — broadcast- or
  at worst sort-merge-small.

`bloom_anti_join` therefore has *exactly* `left_anti` semantics
(pinned against the plain anti-join in tests/test_bloom.py) while
shuffling ~fpp of the probe side instead of all of it.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bitmap size guard: 2^38 bits = 32 GiB of driver bitmap — anything
# bigger than that should shard the gate by key range instead.
MAX_NUM_BITS = 1 << 38


def bloom_params(expected_items: int, fpp: float = 0.02) -> tuple[int, int]:
    """Standard Bloom sizing: optimal m bits and k hashes for n items at
    the target false-positive rate, m rounded up to whole 64-bit words."""
    n = max(1, expected_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = min(MAX_NUM_BITS, ((m + 63) // 64) * 64)
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def _positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """array<long> of the key's k probe positions in [0, num_bits).

    Double hashing g_i = h1 + i*h2 (mod m) with h2 forced nonzero; both
    operands are reduced mod m first so i*h2 stays far from long
    overflow (ANSI mode throws on it) for any m <= MAX_NUM_BITS.
    """
    h1 = F.pmod(F.xxhash64(key, F.lit(0)), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(1)), F.lit(num_bits - 1)) + F.lit(1)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(num_bits)),
    )


def bloom_build(
    df: DataFrame, key_col: str, num_bits: int, num_hashes: int
) -> DataFrame:
    """Aggregate the key column into a Bloom word table (block, word).

    One shuffle whose volume is min(k·|keys|, m/64 · tasks) after the
    map-side partial bit_or — at 10 bits/key the reduced output is at
    most m/64 rows regardless of key count. Duplicate keys are free
    (bit_or is idempotent), so callers never need a distinct() first.
    """
    pos = F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("pos")
    return (
        df.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("block"),
            F.lit(1).cast("long").alias("one"),
            F.col("pos").bitwiseAND(F.lit(63)).cast("int").alias("bit"),
        )
        .select("block", F.expr("shiftleft(one, bit)").alias("w"))
        .groupBy("block")
        .agg(F.bit_or("w").alias("word"))
    )


def bloom_bitmap(bloom_words: DataFrame, num_bits: int) -> np.ndarray:
    """Materialize the word table into a dense driver bitmap — m/8 bytes,
    the compact artifact the whole construction exists to produce."""
    arr = np.zeros(num_bits // 64, dtype=np.int64)
    pdf = bloom_words.toPandas()
    if len(pdf):
        arr[pdf["block"].to_numpy()] = pdf["word"].to_numpy()
    return arr


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bitmap: np.ndarray,
    num_bits: int,
    num_hashes: int,
    flag_col: str = "might_contain",
) -> DataFrame:
    """Add a boolean `flag_col`: true iff all k probe bits are set.

    Probe positions are computed JVM-side (codegen'd xxhash64); the bit
    test itself is a vectorized numpy gather over the broadcast bitmap
    inside an Arrow-batched pandas UDF — no shuffle, no per-row Python.
    """
    bc = df.sparkSession.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def _probe(positions: pd.Series) -> pd.Series:
        if not len(positions):
            return pd.Series(np.zeros(0, dtype=bool))
        p = np.vstack(positions.to_numpy())
        words = bc.value[p >> 6]
        hits = (words >> (p & 63)) & 1
        return pd.Series(hits.all(axis=1))

    pos = _positions(F.col(key_col), num_bits, num_hashes)
    return df.withColumn(flag_col, _probe(pos))


def bloom_anti_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    expected_items: int | None = None,
    fpp: float = 0.02,
) -> DataFrame:
    """left LEFT ANTI JOIN right ON `on`, Bloom-pre-filtered.

    `expected_items` sizes the sketch; omitting it spends one count()
    job on the right side (cheap next to the sketch build it precedes).
    Rows whose keys the sketch rules out bypass the join entirely; only
    true matches plus ~fpp of the probe side reach the exact anti-join.
    """
    if expected_items is None:
        expected_items = right.count()
    num_bits, num_hashes = bloom_params(expected_items, fpp)
    bitmap = bloom_bitmap(
        bloom_build(right, on, num_bits, num_hashes), num_bits
    )
    probed = bloom_might_contain(left, on, bitmap, num_bits, num_hashes)
    sure_new = probed.filter(~F.col("might_contain")).drop("might_contain")
    maybe = probed.filter(F.col("might_contain")).drop("might_contain")
    corrected = maybe.join(right.select(on), on, "left_anti")
    return sure_new.unionByName(corrected)


# m/n coefficients -ln(p)/ln(2)^2 and optimal k = round(coeff*ln 2),
# baked as literals so both engines evaluate the IDENTICAL doubles
# (the only runtime math is n * literal, round, ceil).
BLOOM_PLAN_TARGETS: list[tuple[int, float, int]] = [
    (10000, 9.585058377367439, 7),   # 1% fpp
    (1000, 14.37758756605116, 10),   # 0.1% fpp
]


def bloom_size_planner(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Analytic Bloom-filter sizing for the X15 dedup key universe
    (round 6): count the distinct normalized-content hashes the
    cross-corpus anti-join would insert, then report the optimal
    (m bits, k hashes, bytes) for standard false-positive targets —
    the capacity-planning query an operator runs before allocating
    filter state, m = ceil(n·(−ln p)/ln²2), k = round((m/n)·ln 2).

    The coefficients are baked literals (module constant), so the
    only runtime arithmetic is one exact distinct-count times a
    literal with round-before-ceil — engine-stable at any n. One
    map-side-combined distinct count; the target fan-out is a
    literal explode.

    Returns one row per target: (fpp_ppm, n_keys, m_bits, k_hashes,
    filter_bytes).
    """
    from ..functions.text import content_hash_col

    n = docs.select(content_hash_col(text_col).alias("h")).agg(
        F.count_distinct("h").cast("long").alias("n_keys")
    )
    targets = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(ppm).cast("long").alias("fpp_ppm"),
                    F.lit(coeff).alias("coeff"),
                    F.lit(k).cast("long").alias("k_hashes"),
                )
                for ppm, coeff, k in BLOOM_PLAN_TARGETS
            ]
        )
    ).alias("t")
    out = n.select("n_keys", targets).select(
        F.col("t.fpp_ppm").alias("fpp_ppm"),
        "n_keys",
        F.ceil(F.round(F.col("n_keys").cast("double") * F.col("t.coeff"), 6))
        .cast("long")
        .alias("m_bits"),
        F.col("t.k_hashes").alias("k_hashes"),
    )
    return out.withColumn(
        "filter_bytes", F.expr("(m_bits + 7) div 8").cast("long")
    )

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

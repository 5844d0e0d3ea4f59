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

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
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
        F.explode(deletion_variants_col(col)).alias("key"),
    )
    # lazily checkpoint the variant explode: the pair core consumes
    # entries twice (over-cap pre-pass + member collect), and names are
    # a |distinct strings| table — SMALL at any corpus scale (unlike
    # shingle/band entries, which stay recompute-on-second-pass), so
    # materializing it once is safe and saves the second explode +
    # string-manipulation pass (~1 s of each clusters query at sf0.1)
    entries = entries.localCheckpoint(eager=False)
    # explicit bucket-key exchange at cluster parallelism (r9): the
    # in-bucket pair explode + levenshtein stage is compute-dense but
    # byte-light (slim string payloads), and AQE's byte-based
    # coalescing would fold it onto a couple of cores; an explicit
    # numPartitions is exempt, and the member-collect groupBy reuses
    # this partitioning without a second exchange
    entries = entries.repartition(
        strings.sparkSession.sparkContext.defaultParallelism, "key"
    )
    from .dedup import _bucket_member_pairs

    # the string IS both id and payload here — collect it once per
    # bucket member instead of the generic (id, payload) struct that
    # shipped every name twice through the bucket exchange (r9)
    core = _bucket_member_pairs(
        entries,
        ["key"],
        F.col("id"),
        max_bucket_size,
        lambda m, mj: F.struct(m.alias("s_a"), mj.alias("s_b")),
    )
    pairs = core.select("pr.s_a", "pr.s_b").dropDuplicates(["s_a", "s_b"])
    return (
        pairs.select(
            "s_a",
            "s_b",
            F.levenshtein("s_a", "s_b").alias("dist"),
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


def jaro_winkler_py(a: str, b: str, boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler similarity, bit-exact with DuckDB's
    ``jaro_winkler_similarity`` (verified on 9.5k random + name-shaped
    pairs): standard Jaro match window ``max(|a|,|b|)//2 - 1``,
    half-transposition count, Winkler prefix boost (p=0.1, prefix≤4)
    applied only when jaro > 0.7, and 0.0 when either string is empty
    (including both-empty — the one case textbook formulas call 1.0).

    Plain Python on purpose: it runs inside an Arrow-batched pandas
    UDF over short entity names (no JVM builtin exists for JW — the
    Levenshtein family uses ``F.levenshtein`` instead).
    """
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if la == 1 and lb == 1:
        return 1.0 if a == b else 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if ma[i]:
            while not mb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / la + m / lb + (m - t) / m) / 3
    if j > boost_threshold:
        l = 0
        for x, y in zip(a, b):
            if x == y and l < 4:
                l += 1
            else:
                break
        j += l * 0.1 * (1 - j)
    return j


def jaro_winkler_topk(
    names: DataFrame,
    probes: DataFrame,
    name_col: str = "name",
    probe_col: str = "probe",
    k: int = 5,
) -> DataFrame:
    """Top-k Jaro-Winkler matches for each probe string against a name
    table — the interactive record-linkage lookup ("who is this
    probably?"). Returns (probe, name, jw, rk) with jw rounded to 6 dp
    and rank ties broken by name, so the cutoff is deterministic.

    Scale shape: the probe set is a handful of strings, broadcast to
    every task; the name table streams through ONE narrow pass (no
    shuffle until the per-probe top-k, which TakeOrderedAndProject-
    style reduces to k rows per probe). JW itself is an Arrow-batched
    pandas UDF (no JVM builtin) — per-batch Python, never per-row
    Python at the plan level.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _jw(pa: pd.Series, nb: pd.Series) -> pd.Series:
        return pd.Series(
            [jaro_winkler_py(x, y) for x, y in zip(pa, nb)], dtype="float64"
        )

    from ..utils import parallelize_narrow

    p = probes.select(F.col(probe_col).alias("probe"))
    # spread the per-pair Python JW across cores: a single-file name
    # table scans as 1-2 partitions, serializing the whole |names| x
    # |probes| pandas-UDF stage on one worker (r9; no-op at real scale
    # where the scan already has many splits)
    n = parallelize_narrow(names).select(F.col(name_col).alias("name"))
    scored = (
        n.crossJoin(F.broadcast(p))
        .filter(F.col("name") != F.col("probe"))
        .select(
            "probe",
            "name",
            F.round(_jw(F.col("probe"), F.col("name")), 6).alias("jw"),
        )
    )
    w = Window.partitionBy("probe").orderBy(F.desc("jw"), F.asc("name"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select("probe", "name", "jw", "rk")
    )


def golden_record(
    records: DataFrame,
    clusters: DataFrame,
    id_col: str,
    head_col: str,
    max_cols: list[str] | None = None,
    mode_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
) -> DataFrame:
    """Survivorship merge — the step after entity resolution: collapse
    each duplicate cluster into ONE golden record with explicit,
    deterministic rules (MDM's "which value wins"):

    - `head_col`: taken from the cluster head (the member whose id IS
      the cluster id — star contraction makes that the minimum id);
    - `max_cols`: best-value-wins (MAX) per cluster;
    - `mode_cols`: most frequent value wins, ties to the smallest value
      (two-phase: count per (cluster, value), then a rank over the
      AGGREGATED counts — never a window over raw records);
    - `distinct_cols`: conflict signal — the count of distinct values
      (1 == consensus, >1 == the records genuinely disagree).

    `clusters` is (node_id, cluster_id) from near_dup_clusters; records
    not in any cluster become their own golden record (cluster_id =
    their own id), so output cardinality = |entities|, input = |records|.
    Scale shape: the cluster map is |linked records| (broadcast-sized
    next to the record table), the merge is ONE map-side-combined
    groupBy, and each mode column adds one small aggregate + rank over
    |clusters × distinct values| rows.
    """
    max_cols = max_cols or []
    mode_cols = mode_cols or []
    distinct_cols = distinct_cols or []

    cmap = clusters.select(
        F.col("node_id").alias(id_col), F.col("cluster_id").alias("__gid")
    )
    # ONE explicit exchange on the entity key feeds the whole
    # survivorship tail (r10): hash(__gid) satisfies the clustering
    # requirement of the main merge groupBy, every mode column's
    # (__gid, value) count (subset rule), its rank window, AND the
    # final picks joins — the unkeyed form paid a separate exchange
    # per consumer of `full` and re-evaluated the record⋈cluster join
    # each time. Explicit numPartitions keeps the compute-dense merge
    # at cluster parallelism (exempt from AQE byte-based coalescing;
    # no-op in shape at real scale where the join output is already
    # wide).
    full = (
        records.join(F.broadcast(cmap), id_col, "left")
        .withColumn("__gid", F.coalesce("__gid", F.col(id_col)))
        .repartition(
            records.sparkSession.sparkContext.defaultParallelism, "__gid"
        )
    )

    aggs = [
        F.count(F.lit(1)).alias("n_members"),
        F.max(
            F.when(F.col(id_col) == F.col("__gid"), F.col(head_col))
        ).alias(head_col),
    ]
    aggs += [F.max(c).alias(f"{c}_max") for c in max_cols]
    aggs += [
        F.countDistinct(c).cast("long").alias(f"n_{c}") for c in distinct_cols
    ]
    out = full.groupBy(F.col("__gid").alias("cluster_id")).agg(*aggs)

    for c in mode_cols:
        counts = full.groupBy("__gid", c).agg(F.count(F.lit(1)).alias("__cnt"))
        w = Window.partitionBy("__gid").orderBy(F.desc("__cnt"), F.asc(c))
        pick = (
            counts.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select(F.col("__gid").alias("cluster_id"), c)
        )
        out = out.join(pick, "cluster_id")
    return out

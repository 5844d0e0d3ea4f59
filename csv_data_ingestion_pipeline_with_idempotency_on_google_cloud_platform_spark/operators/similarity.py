"""Similarity search over embedding columns — extension X3 (SURVEY.md §2b).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set, compute dot products JVM-side with higher-order functions,
take top-k with a rank window (per-query partition). At 100 TB the
brute-force pass is one full scan — embarrassingly parallel, no shuffle
except the final per-query top-k (TakeOrdered-style, tiny).

The scale path is LSH bucketing: random-hyperplane signatures prune the
candidate set to same-bucket vectors; recall is tested against the
brute-force oracle in tests/test_similarity.py.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity_col, l2_norm_col
from ..utils import parallelize_narrow


def topk_cosine(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to the vector with `query_vec_id`.

    Returns (vec_id, rank, cos_sim) — query excluded, ties broken by id.
    """
    q = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).cast("array<double>").alias("__q")
    )
    rest = parallelize_narrow(emb).filter(F.col(id_col) != query_vec_id).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    scored = rest.join(F.broadcast(q)).select(
        F.col(id_col), cosine_similarity_col("__v", "__q").alias("__cos")
    )
    return _rank_topk(scored, id_col, k)


def _rank_topk(scored: DataFrame, id_col: str, k: int) -> DataFrame:
    """Distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heaps, no global sort/shuffle); the rank window then
    runs over only the k survivors."""
    top = scored.orderBy(F.col("__cos").desc(), F.col(id_col)).limit(k)
    # constant-valued partition key: the window input is the k survivors
    # of the limit (single tiny partition by construction). id%1 == 0 for
    # every row but is non-foldable, so it survives optimization and the
    # "moving all data to a single partition" warning never fires — a
    # bare literal gets constant-folded back to an empty partition spec.
    w = Window.partitionBy(F.col(id_col) % 1).orderBy(
        F.col("__cos").desc(), F.col(id_col)
    )
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col(id_col), F.col("rank"), F.round("__cos", 6).alias("cos_sim")
    )


def topk_cosine_many(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Batch variant: top-k neighbors for every row of `queries`
    (query_id, embedding). Broadcast the query side; rank window is
    partitioned by query so the sort never goes global."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("__q")
    )
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    scored = base.join(F.broadcast(q), on=F.col(id_col) != F.col(query_id_col)).select(
        query_id_col, id_col, cosine_similarity_col("__v", "__q").alias("__cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("__cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", F.round("__cos", 6).alias("cos_sim"))
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (stdlib RNG; stable across runs)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id for a vector column given literal hyperplanes —
    pure expression: per-plane double dot product → sign bit → packed int."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def topk_cosine_lsh(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH prunes to the query's
    probe buckets, then exact cosine within. Same output schema as
    topk_cosine; recall measured in tests.

    Multi-probe: the query side explodes into all buckets within
    `probe_radius` bit flips (radius 1 → n_planes+1 probes), so the
    candidate join stays a plain equality hash join — at scale the table
    is bucketed/partitioned by the bucket column and a query touches
    (n_planes+1)/2^n_planes of the data instead of scanning everything.
    """
    planes = _hyperplanes(n_planes, dim, seed)
    bucketed = emb.select(
        F.col(id_col),
        F.col(vec_col).alias("__vec"),
        lsh_bucket_col(vec_col, planes).alias("__bucket"),
    )
    masks = [0]
    if probe_radius >= 1:
        masks += [1 << i for i in range(n_planes)]
    if probe_radius >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    qrow = bucketed.filter(F.col(id_col) == query_vec_id).select(
        F.explode(
            F.array(*[F.col("__bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("__probe"),
        F.col("__vec").cast("array<double>").alias("__q"),
    )
    cand = bucketed.filter(F.col(id_col) != query_vec_id).join(
        F.broadcast(qrow), on=F.col("__bucket") == F.col("__probe")
    )
    scored = cand.select(
        F.col(id_col), cosine_similarity_col("__vec", "__q").alias("__cos")
    )
    return _rank_topk(scored, id_col, k)


def ivf_assignments(
    emb: DataFrame,
    n_centroids: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer without iterative training: centroids are the
    first `n_centroids` vectors by id (deterministic; real deployments
    would k-means a sample — the assignment/search machinery is
    identical). Returns (centroids_df, assigned_df with `cell` column).

    n_centroids=None derives the cell count from corpus size with the
    standard √n rule (floored at 16): cells and per-cell postings both
    grow as √n, balancing probe fan-out against per-cell scan cost.

    Assignment is a broadcast join + per-row argmax over the centroid
    array — one narrow pass, no shuffle. At 100 TB the table is then
    written partitioned/bucketed by `cell` so a probe reads only
    n_probe/n_centroids of the data.
    """
    if n_centroids is None:
        n_centroids = max(16, int(emb.count() ** 0.5))

    # constant-valued non-foldable partition key over ≤ n_centroids rows
    # (post-limit) — see _rank_topk for why id%1 replaces a global spec
    w = Window.partitionBy(F.col(id_col) % 1).orderBy(F.col(id_col))
    centroids = (
        emb.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.row_number().over(w).alias("cell"),
            F.col(vec_col).cast("array<double>").alias("cvec"),
        )
    )
    return centroids, assign_cells(emb, centroids, id_col, vec_col)


def assign_cells(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine: broadcast
    the packed (cell, cvec) list, per-row argmax as an expression fold
    — one narrow pass, no shuffle. Shared by the one-shot quantizer
    (ivf_assignments) and incremental index appends
    (ann_index.append_to_ivf_index), which MUST use the index's stored
    centroids, never recomputed ones."""
    packed = centroids.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("cell", "cvec"))
        ).alias("cents")
    )
    return emb.join(F.broadcast(packed)).select(
        F.col(id_col),
        # keep the source element type (float stays float on disk —
        # half the index bytes); the similarity fold casts internally
        F.col(vec_col).alias("__vec"),
        # argmax cosine over the centroid list, computed as a fold
        F.aggregate(
            "cents",
            F.struct(
                F.lit(-2.0).cast("double").alias("best"),
                F.lit(0).alias("cell"),
            ),
            lambda acc, c: F.when(
                cosine_similarity_col(F.col("__vec"), c["cvec"]) > acc["best"],
                F.struct(
                    cosine_similarity_col(F.col("__vec"), c["cvec"]).alias("best"),
                    c["cell"].alias("cell"),
                ),
            ).otherwise(acc),
        )["cell"].alias("cell"),
    )


def kmeans_train_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means, the iterative trainer behind a real IVF index
    (ivf_assignments documents that deployments k-means a sample; this
    is that trainer). Distributed shape per iteration:

    - centroids ship as an explicit SparkContext.broadcast of the
      k×dim numpy matrix — ONE torrent transfer per executor per
      iteration, cached for every task on that executor (a closure
      capture would re-serialize the matrix into every task: at
      SemDeDup's √n sizing, n=10⁹ → k≈31.6k×dim ≈ hundreds of MB
      per task per iteration). Assignment is a narrow per-row argmin
      of squared L2 computed as ONE numpy matmul per Arrow batch, no
      shuffle. The earlier pure-expression fold was bit-identical but
      HOFs don't codegen — ~10 µs per (row, centroid, dim) element
      interpreted, i.e. minutes per billion rows×k; dense linear
      algebra is exactly the seam the Arrow batch path exists for
      (precedent: the bloom probe, bloom.py). Each iteration's
      broadcast is unpersisted once its partial-average collect
      lands (executors drop the stale matrix; the driver copy
      remains, so the lazily-evaluated final assignment can still
      re-fetch).
    - k ceiling: the driver and every executor hold k×dim doubles,
      and the per-iteration update collects k×dim partial averages —
      practical to k≈10⁴ (10⁴×256×8B ≈ 20 MB). Past that, use
      kmeans_two_level: two √k-sized Lloyd stages whose per-row cost
      is O(√k) and whose broadcast at any moment is ≤ k×dim shipped
      once (not per task).
    - update shuffles only k×dim (cluster, pos) partial averages
      (posexplode + avg, map-side combined), never raw vectors;
    - the driver holds k×dim floats between iterations — the only
      driver-side state an iterative algorithm genuinely needs.

    Deterministic: init = the k lowest-id vectors; argmin ties break to
    the first centroid (np.argmin first-minimum, same rule as the old
    array_position fold — though the expanded ‖c‖²−2v·c form can round
    differently than the per-element fold on exact ties).
    Empty clusters keep their previous centroid. Returns
    (id_col, cluster) assignments under the trained centroids.
    """
    vec = F.col(vec_col).cast("array<double>")
    cents = [
        [float(x) for x in r["v"]]
        for r in emb.orderBy(id_col).limit(k).select(vec.alias("v")).collect()
    ]
    # numpy releases the GIL inside matmul, but batches arrive per
    # partition: spread a single-file input first (no-op at scale),
    # then checkpoint ONCE so the Lloyd loop's per-iteration scan reads
    # materialized partitions instead of re-running the spread shuffle
    # every iteration (lazy: iteration 1's job materializes it). This
    # is the standard iterative-trainer persistence discipline; the
    # drift tracker caught the un-checkpointed form re-paying the
    # exchange per iteration (~30% of semantic_dedup's wall at sf0.1).
    emb = parallelize_narrow(emb).localCheckpoint(eager=False)
    sc = emb.sparkSession.sparkContext

    def assign_col(cents_now: list[list[float]]):
        bc = sc.broadcast(np.asarray(cents_now, dtype=np.float64))

        @F.pandas_udf("int")
        def assign(vs: pd.Series) -> pd.Series:
            if len(vs) == 0:
                return pd.Series([], dtype="int32")
            c = bc.value
            c2 = (c * c).sum(axis=1)
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
            # argmin ‖v−c‖² == argmin ‖c‖² − 2·v·c  (‖v‖² is constant per row)
            return pd.Series(
                np.argmin(c2[None, :] - 2.0 * (m @ c.T), axis=1).astype("int32")
            )

        return assign(vec), bc

    for _ in range(iters):
        col, bc = assign_col(cents)
        assigned = emb.withColumn("cluster", col)
        partials = (
            assigned.select("cluster", F.posexplode(vec).alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        # executors drop this iteration's matrix; the driver copy stays
        # (non-blocking), so nothing here races the collect above
        bc.unpersist()
        by_cluster: dict[int, dict[int, float]] = {}
        for r in partials:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        cents = [
            [by_cluster[ci][p] for p in range(len(cents[ci]))]
            if ci in by_cluster
            else cents[ci]
            for ci in range(k)
        ]
    # final broadcast stays alive: the returned DataFrame is lazy and the
    # consumer's action re-fetches it on demand
    col, _bc = assign_col(cents)
    return emb.withColumn("cluster", col).select(id_col, "cluster")


def kmeans_literal_assign(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The k-means E-STEP alone, with the centroids pinned to Lloyd's
    deterministic INIT (the k lowest-id vectors) and every component
    scaled to an exact e6 integer (round(x·1e6) BIGINT, the
    margin_knn/embedding_lsh scheme) — round 7's oracle-replayable
    twin of the iterative trainer: squared-L2 distances become exact
    integer sums (order-independent — no float seam anywhere in the
    argmin), so assignment + distance replay bit-for-bit in any
    engine. This is the assignment path a served IVF/k-means index
    runs per query batch once training is done; the rows-only
    `kmeans_assign` keeps covering the training loop itself.

    Distributed shape: centroids are one bounded k×dim driver collect
    (the same bounded state the trainer holds) baked into a literal
    array-of-structs; the per-row argmin is ONE narrow fold — zero
    joins, zero shuffles, no Python. Magnitudes: |e6 component| ≤
    ~4e6 ⇒ per-dim square ≤ 1.6e13, ×dim(64) ≤ 1e15 — far inside
    BIGINT.

    Returns (id_col, cluster, d2) with first-lowest-cid tie-break.
    """
    emb = emb.where(F.col(vec_col).isNotNull())
    vq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0).cast("long"),
    )
    cents = [
        (int(r["i"]), [int(x) for x in r["v"]])
        for r in emb.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).cast("long").alias("i"), vq.alias("v"))
        .collect()
    ]
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(cid).cast("long").alias("cid"),
                F.array(*[F.lit(c).cast("long") for c in cv]).alias("cv"),
            )
            for cid, cv in cents
        ]
    )
    d2 = lambda cv: F.aggregate(  # noqa: E731 - exact integer ΣΔ²
        F.zip_with(F.col("__v"), cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # argmin via array_min over (d2, cid) structs: lexicographic struct
    # ordering IS the (distance asc, lowest-cid tie-break) total order,
    # and — unlike a when()-chained fold — each centroid's d2 fold is
    # evaluated exactly ONCE per row (the fold form evaluated it twice:
    # once in the comparison, once in the kept struct; measured 6x on
    # ivf_literal_probe at the 100x embeddings rung)
    best = F.array_min(
        F.transform(
            cent_arr,
            lambda c: F.struct(
                d2(c["cv"]).alias("d2"), c["cid"].alias("cid")
            ),
        )
    )
    return (
        parallelize_narrow(emb)
        .select(F.col(id_col), vq.alias("__v"))
        .select(F.col(id_col), best.alias("__b"))
        .select(
            id_col,
            F.col("__b.cid").alias("cluster"),
            F.col("__b.d2").alias("d2"),
        )
    )


def kmeans_two_level(
    emb: DataFrame,
    k1: int = 8,
    k2: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hierarchical (two-level) Lloyd for k = k1·k2 total clusters —
    the scale path past the flat trainer's k≈10⁴ ceiling (SemDeDup's
    √n sizing reaches k≈31.6k at n=10⁹ docs).

    Why two levels: flat Lloyd pays O(k) argmin work per row per
    iteration and holds one k×dim matrix everywhere. Splitting into a
    coarse k1-means followed by a per-cell k2-means makes the per-row
    cost O(k1)+O(k2) = O(√k) when k1≈k2≈√k, while total centroid state
    stays k×dim and ships via ONE torrent broadcast per iteration
    (never per task). The per-iteration driver collect is still ≤k×dim
    partial averages — same bound as flat, just reached with √k-sized
    matmuls.

    Level 2 trains all k1 cells' sub-centroids JOINTLY: each row
    argmins only over its own cell's k2×dim slice of the broadcast
    (k1,k2,dim) tensor, grouped per Arrow batch by cell id — no
    per-cell driver loop, no per-cell job. The coarse assignment is a
    narrow deterministic matmul column and is recomputed per level-2
    iteration rather than materialized (recompute is O(k1)=O(√k) per
    row; at 100 TB you'd persist the assigned frame to cluster-local
    storage instead — same plan, one extra checkpoint).

    Deterministic throughout: coarse init = k1 lowest-id vectors, sub
    init = each cell's k2 lowest-id members (cells with fewer than k2
    members repeat their first member; argmin's first-minimum rule
    collapses the duplicates), empty (cell, sub) keeps its previous
    centroid. Returns (id_col, cluster) with cluster = coarse·k2 + sub
    ∈ [0, k1·k2).
    """
    vec = F.col(vec_col).cast("array<double>")
    # checkpoint once so both levels' iterations read materialized
    # partitions (see the flat trainer's note)
    emb = parallelize_narrow(emb).localCheckpoint(eager=False)
    sc = emb.sparkSession.sparkContext

    # ---- level 1: coarse k1-means (flat trainer's loop, centroids kept)
    coarse_cents = [
        [float(x) for x in r["v"]]
        for r in emb.orderBy(id_col).limit(k1).select(vec.alias("v")).collect()
    ]

    def coarse_col(cents_now: list[list[float]]):
        bc = sc.broadcast(np.asarray(cents_now, dtype=np.float64))

        @F.pandas_udf("int")
        def assign(vs: pd.Series) -> pd.Series:
            if len(vs) == 0:
                return pd.Series([], dtype="int32")
            c = bc.value
            c2 = (c * c).sum(axis=1)
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
            return pd.Series(
                np.argmin(c2[None, :] - 2.0 * (m @ c.T), axis=1).astype("int32")
            )

        return assign(vec), bc

    for _ in range(iters):
        col, bc = coarse_col(coarse_cents)
        partials = (
            emb.withColumn("coarse", col)
            .select("coarse", F.posexplode(vec).alias("pos", "v"))
            .groupBy("coarse", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        bc.unpersist()
        by_c: dict[int, dict[int, float]] = {}
        for r in partials:
            by_c.setdefault(r["coarse"], {})[r["pos"]] = r["m"]
        coarse_cents = [
            [by_c[ci][p] for p in range(len(coarse_cents[ci]))]
            if ci in by_c
            else coarse_cents[ci]
            for ci in range(k1)
        ]

    col, _bc1 = coarse_col(coarse_cents)
    assigned = emb.withColumn("coarse", col)
    dim = len(coarse_cents[0])

    # ---- level 2 init: each cell's k2 lowest-id members (≤ k1·k2 = k
    # rows collected — the same k×dim driver bound as the flat trainer)
    w = Window.partitionBy("coarse").orderBy(id_col)
    seeds = (
        assigned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k2)
        .select("coarse", "__rn", vec.alias("v"))
        .collect()
    )
    sub = np.zeros((k1, k2, dim), dtype=np.float64)
    seen: dict[int, list[int]] = {}
    for r in seeds:
        sub[r["coarse"], r["__rn"] - 1] = np.asarray(r["v"], dtype=np.float64)
        seen.setdefault(r["coarse"], []).append(r["__rn"] - 1)
    for ci, slots in seen.items():
        if len(slots) < k2:  # short cell: repeat its first member
            for j in range(k2):
                if j not in slots:
                    sub[ci, j] = sub[ci, slots[0]]

    def sub_col(sub_now: np.ndarray):
        bc = sc.broadcast(sub_now)

        @F.pandas_udf("int")
        def assign(coarse: pd.Series, vs: pd.Series) -> pd.Series:
            if len(vs) == 0:
                return pd.Series([], dtype="int32")
            S = bc.value
            S2 = (S * S).sum(axis=2)
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
            co = coarse.to_numpy()
            out = np.empty(len(vs), dtype=np.int32)
            for ci in np.unique(co):
                idx = co == ci
                out[idx] = np.argmin(
                    S2[ci][None, :] - 2.0 * (m[idx] @ S[ci].T), axis=1
                ).astype("int32")
            return pd.Series(out)

        return assign(F.col("coarse"), vec), bc

    for _ in range(iters):
        col2, bc = sub_col(sub)
        partials = (
            assigned.withColumn("sub", col2)
            .select("coarse", "sub", F.posexplode(vec).alias("pos", "v"))
            .groupBy("coarse", "sub", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        bc.unpersist()
        # empty (coarse, sub) cells simply stay at their previous
        # centroid — the copy carries them, partials overwrite the rest
        nxt = sub.copy()
        for r in partials:
            nxt[r["coarse"], r["sub"], r["pos"]] = r["m"]
        sub = nxt

    col2, _bc2 = sub_col(sub)
    return assigned.withColumn("sub", col2).select(
        F.col(id_col),
        (F.col("coarse").cast("long") * k2 + F.col("sub")).alias("cluster"),
    )


def topk_cosine_ivf(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF: score only vectors whose cell is among
    the query's `n_probe` nearest centroids. Same schema as topk_cosine."""
    centroids, assigned = ivf_assignments(emb, n_centroids, id_col, vec_col)
    q = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).cast("array<double>").alias("__q")
    )
    probe_cells = (
        centroids.join(F.broadcast(q))
        .select("cell", cosine_similarity_col("cvec", "__q").alias("__sim"))
        .orderBy(F.col("__sim").desc(), "cell")
        .limit(n_probe)
        .select("cell")
    )
    cand = (
        assigned.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(probe_cells), "cell", "semi")
        .join(F.broadcast(q))
    )
    scored = cand.select(
        F.col(id_col), cosine_similarity_col("__vec", "__q").alias("__cos")
    )
    return _rank_topk(scored, id_col, k)


def embedding_near_dup_pairs(
    emb: DataFrame,
    min_cosine: float = 0.95,
    n_tables: int = 8,
    planes_per_table: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-dup detection via banded multi-table LSH:
    `n_tables` independent hyperplane tables, `planes_per_table` sign
    bits each; candidate pairs are same-bucket within ANY table, then an
    exact cosine filter verifies. Returns (id_a, id_b, cos_sim).

    Scale shape (shared with the MinHash band path, dedup._bucket_pairs):
    each row emits n_tables (table_id, bucket) entries — bucket space
    per table is 2^planes_per_table × the shuffle's partitioning, NOT a
    global 2^6=64 — pairs are expanded inside collected buckets (one
    shuffle, vectors cross the wire once), and `max_bucket_size` drops
    degenerate hot buckets (e.g. the all-zeros embedding) so no bucket
    ever goes O(m²) at 100 TB.

    Recall at cos≥0.95 with 8×8 (p = 1-θ/π ≈ 0.9, per-table p^8 ≈ 0.43,
    any-of-8 ≈ 0.99) is asserted against planted near-identical pairs in
    tests/test_dedup_similarity.py.
    """
    from .dedup import _bucket_pairs

    all_planes = _hyperplanes(n_tables * planes_per_table, dim, seed)
    tables = [
        all_planes[t * planes_per_table : (t + 1) * planes_per_table]
        for t in range(n_tables)
    ]
    entries = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("table_id"),
                    lsh_bucket_col(vec_col, tables[t]).alias("bucket"),
                )
                for t in range(n_tables)
            ])
        ).alias("e"),
    ).select("id", "v", "e.table_id", "e.bucket")
    pairs = _bucket_pairs(entries, ["table_id", "bucket"], ("id", "v"), max_bucket_size)
    scored = pairs.select(
        "id_a", "id_b", cosine_similarity_col("pa", "pb").alias("cos")
    )
    return scored.filter(F.col("cos") >= min_cosine).select(
        "id_a", "id_b", F.round("cos", 4).alias("cos_sim")
    )


def hard_negatives(
    emb: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the k most cosine-similar vectors with a DIFFERENT label — the
    negatives closest to the decision boundary, which carry most of the
    gradient signal.

    Same shape as topk_cosine_many (broadcast anchors, per-anchor rank
    window, deterministic (sim desc, id asc) tie-break); the label
    inequality rides in the join condition, so same-label candidates
    are dropped before scoring. The inequality is NULL-safe
    (IS DISTINCT FROM): unlabeled corpus vectors are valid negatives
    for labeled anchors (and vice versa); only NULL-vs-NULL counts as
    "same label". At scale the anchor side is a sampled subset
    (thousands), so the broadcast stays small while the corpus side
    never shuffles.
    """
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).cast("array<double>").alias("__q"),
        F.col(label_col).alias("anchor_label"),
    )
    base = emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.col(label_col),
    )
    scored = base.join(
        F.broadcast(a), on=~F.col(label_col).eqNullSafe(F.col("anchor_label"))
    ).select(
        "anchor_id",
        id_col,
        F.col(label_col).alias("negative_label"),
        cosine_similarity_col("__v", "__q").alias("__cos"),
    )
    w = Window.partitionBy("anchor_id").orderBy(F.col("__cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id",
            id_col,
            "negative_label",
            "rank",
            F.round("__cos", 6).alias("cos_sim"),
        )
    )


def semantic_dedup(
    emb: DataFrame,
    k: int | None = 16,
    iters: int = 4,
    min_cosine: float = 0.97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
    max_cluster_size: int | None = 10_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023):
    cluster the embedding space with k-means, then compare vectors only
    WITHIN a cluster and drop every vector that has a lower-id
    τ-neighbor there. Returns the surviving rows of `emb` unchanged.

    Scale shape: clustering makes the pair stage Σ|cluster|² instead of
    n² — with k grown ~√n (the same sizing rule as the IVF index) the
    expected cluster stays bounded, and `max_cluster_size` hard-caps
    degenerate clusters the way the LSH hot-bucket cap does. The pair
    stage reuses `_bucket_pairs` keyed by cluster id: one shuffle,
    vectors cross the wire once, pairs expand inside the collected
    cluster. Survivor choice is the deterministic min-id rule (one
    pass, not transitive closure — a dropped vector can itself be the
    lower-id witness for another drop, matching the one-shot pairwise
    semantics of the paper rather than single-linkage clustering).

    `assignments` overrides the built-in k-means (id_col, cluster) —
    production would train centroids on a sample and assign with
    `assign_cells`; tests use it to pin clustering for brute-force
    parity. k=None derives the cluster count by the same √n rule as
    the IVF quantizer, which is what keeps Σ|cluster|² ≈ n^1.5 rather
    than n²/const as the corpus grows.

    Vectors are L2-normalized ONCE before pair expansion, so each
    pair costs a single dot-product fold instead of dot + two norms —
    the pair stage is the quadratic-ish part, the normalization the
    linear part; do the 3× less work on the quadratic side.
    """
    from .dedup import _bucket_pairs

    if k is None:
        k = max(16, int(emb.count() ** 0.5))
    if assignments is None:
        # checkpoint the NARROW (id, cluster) assignment lazily (r9):
        # _bucket_pairs consumes its entries twice (over-cap pre-pass +
        # member collect), and without a boundary each pass re-ran the
        # final k-means assignment pandas UDF over the full table
        assignments = kmeans_train_assign(
            emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col
        ).localCheckpoint(eager=False)
    vec = F.col(vec_col).cast("array<double>")
    norm = F.greatest(l2_norm_col(vec), F.lit(1e-12))
    entries = emb.join(assignments, id_col).select(
        F.col(id_col).alias("id"),
        F.transform(vec, lambda x: x / norm).alias("v"),
        "cluster",
    )
    pairs = _bucket_pairs(entries, ["cluster"], ("id", "v"), max_cluster_size)
    dot = F.aggregate(
        F.zip_with("pa", "pb", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # identical normalized vectors score exactly 1.0 — this both removes
    # float-rounding flutter on true duplicates AND covers zero-norm
    # rows (two all-zero embeddings ARE duplicates of each other, but
    # their clamped-norm dot product is 0)
    score = F.when(F.col("pa") == F.col("pb"), F.lit(1.0)).otherwise(dot)
    dropped = (
        pairs.select("id_b", score.alias("__cos"))
        .filter(F.col("__cos") >= min_cosine)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return emb.join(dropped, id_col, "left_anti")


def _md5_hyperplanes(n_planes: int, dim: int) -> list[list[int]]:
    """INTEGER hyperplanes any engine can replay: component (i, c) is
    the 60-bit integer parsed from the first 15 hex chars of
    ``md5(f"{i}:{c}")`` recentred to ±2^59 — hashlib here produces the
    exact values a SQL engine's md5() produces, so the planes are a
    shared constant, not an engine artifact."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{i}:{c}".encode()).hexdigest()[:15], 16) - (1 << 59)
            for c in range(dim)
        ]
        for i in range(n_planes)
    ]


def embedding_lsh_pairs_exact(
    emb: DataFrame,
    min_cosine_e2: int = 35,
    n_tables: int = 8,
    planes_per_table: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """ORACLE-VERIFIABLE embedding near-dup: multi-table sign-LSH
    candidates + an exact cosine threshold, with NO float anywhere in
    the pair decision (the `minhash_jaccard_pairs` pattern applied to
    the embedding family).

    The production family (`embedding_near_dup_pairs`) decides sign
    bits and the cosine filter in floating point, whose summation
    order differs between engines — a near-zero dot product could flip
    a bucket bit and change the pair set, so the driver could only
    rows-check it. This twin is exact end-to-end:

    - vectors quantize to integer micro-units (round(x·1e6) — exact:
      a float32 value times 1e6 is exact in double and never lands on
      .5, see the cents convention in benford_profile);
    - hyperplane components are md5-derived 60-bit integers
      (`_md5_hyperplanes`), so each sign bit is the sign of an exact
      DECIMAL(38,0) dot product — identical in any engine;
    - the cosine threshold never divides: keep a pair iff dot > 0 and
      1e4·dot² ≥ (min_cosine_e2)²·(a·a)(b·b). Vector-vector dots are
      plain LONG folds (|component| ≤ 380 keeps a 64-dim dot inside
      long range — embeddings are unit-ish at ~0.15); only the plane
      dots (60-bit integer components) and the per-pair scalar
      threshold products (~1e27) use DECIMAL(38,0). The default threshold is
      cos ≥ 0.35 with 8 tables × 6 sign bits: the driver fixture's
      embeddings are near-orthogonal random points (max pairwise cos
      ≈ 0.51), so a classic 0.95 near-dup bar matches zero pairs and
      would make the oracle check vacuous — 0.35 with 8-bit tables
      keeps dozens of true pairs (real evidence for the value-hash
      gate) while holding random 2000-choose-2 collisions to ~4k
      candidates per sf0.01 run (6-bit tables admitted 60× more junk
      than survivors — scoring them dominated the query);
    - the reported cos_sim is double math on those identical integers
      (IEEE-deterministic given identical inputs), rounded to 6 dp.

    Scale shape is the production one: per-row narrow sign-bit
    projection (no join against a plane table — planes are literals),
    one bucket shuffle per table via `_bucket_pairs` with the
    pre-collect hot-bucket cap, quantized vectors crossing the wire
    once. Returns (id_a, id_b, cos_sim ≥ min_cosine_e2/100).
    """
    from .dedup import _bucket_pairs

    planes = _md5_hyperplanes(n_tables * planes_per_table, dim)
    vq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0).cast("long"),
    )

    def bucket(t: int) -> F.Column:
        # ONE parsed SQL expression per table: the Column-API form
        # (F.lit per plane component) issued 4096+ py4j calls and cost
        # 10+ s of DRIVER-side plan construction per query — measured
        # as the dominant term, dwarfing actual execution (~2 s). A
        # plane is a literal array in the expression text; parsing a
        # ~15 KB string is one call.
        #
        # r10 measured non-finding: splitting each plane as
        # p = hi·2^30 + lo so the sign rides TWO pure-LONG folds plus
        # one scalar DECIMAL recombination (exact same integer sign)
        # measured SLOWER (2.52 → 3.01 s best-of-5): in the interpreted
        # HOF path the per-element cost is the lambda dispatch and the
        # zip_with array allocation, not BigDecimal arithmetic, and the
        # split doubles the fold count. The single decimal fold stays.
        terms = []
        for j in range(planes_per_table):
            plane = planes[t * planes_per_table + j]
            arr = ", ".join(f"CAST({p} AS DECIMAL(38,0))" for p in plane)
            terms.append(
                f"CAST(CASE WHEN aggregate("
                f"zip_with(__vq, array({arr}), (x, y) -> CAST(x AS DECIMAL(38,0)) * y), "
                f"CAST(0 AS DECIMAL(38,0)), (acc, x) -> acc + x) > 0 "
                f"THEN {1 << j} ELSE 0 END AS BIGINT)"
            )
        return F.expr(" + ".join(terms))

    # pair-stage dots are pure LONG: |vq| ≤ ~2e6 ⇒ per-term product
    # ≤ 4e12 and a 64-term sum ≤ 2.6e14, far inside long range — the
    # first (decimal-fold) version spent ~9 s/run interpreting 50M
    # decimal multiply-adds over the 259k sf0.1 candidate pairs; long
    # folds whole-stage-codegen. Decimal appears only in the per-pair
    # SCALAR threshold (dot² and naa·nbb reach ~1e27). Self-norms ride
    # the payload (computed once per VECTOR, not twice per pair).
    def ldot(a, b) -> F.Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    payload = F.struct(
        F.col("__vq").alias("v"), ldot(F.col("__vq"), F.col("__vq")).alias("n2")
    )
    entries = (
        parallelize_narrow(emb)
        .select(F.col(id_col).alias("id"), vq.alias("__vq"))
        .select(
            "id",
            payload.alias("__p"),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(t).alias("table_id"), bucket(t).alias("bucket")
                    )
                    for t in range(n_tables)
                ])
            ).alias("e"),
        )
        .select("id", "__p", "e.table_id", "e.bucket")
    )
    # score BEFORE the cross-table pair dedup: _bucket_pairs'
    # dropDuplicates would shuffle every candidate pair carrying BOTH
    # 64-long quantized vectors (~260 MB at sf0.1's 259k candidates —
    # measured as the query's dominant stage); scoring first reduces
    # the dedup shuffle to 5 scalars per pair, and the per-pair values
    # are identical whichever bucket emitted the pair, so deduping the
    # scored row is equivalent.
    from .dedup import _bucket_member_pairs

    core = _bucket_member_pairs(
        entries,
        ["table_id", "bucket"],
        F.struct(F.col("id").alias("i"), F.col("__p").alias("p")),
        max_bucket_size,
        lambda m, mj: F.struct(
            m["i"].alias("id_a"),
            mj["i"].alias("id_b"),
            m["p"].alias("pa"),
            mj["p"].alias("pb"),
        ),
    )
    dec = "decimal(38,0)"
    scored = core.select(
        F.col("pr.id_a").alias("id_a"),
        F.col("pr.id_b").alias("id_b"),
        ldot(F.col("pr.pa.v"), F.col("pr.pb.v")).alias("__dot"),
        F.col("pr.pa.n2").alias("__naa"),
        F.col("pr.pb.n2").alias("__nbb"),
    ).dropDuplicates(["id_a", "id_b"])
    thr2 = min_cosine_e2 * min_cosine_e2
    kept = scored.filter(
        (F.col("__dot") > 0)
        & (
            F.lit(10000).cast(dec) * F.col("__dot").cast(dec) * F.col("__dot").cast(dec)
            >= F.lit(thr2).cast(dec) * F.col("__naa").cast(dec) * F.col("__nbb").cast(dec)
        )
    )
    cos = F.col("__dot").cast("double") / F.sqrt(
        F.col("__naa").cast("double") * F.col("__nbb").cast("double")
    )
    return kept.select("id_a", "id_b", F.round(cos, 6).alias("cos_sim"))


def margin_knn_match(
    emb: DataFrame,
    src_label: int = 0,
    tgt_label: int = 1,
    k: int = 4,
    min_margin_milli: int = 1020,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Margin-based cross-group nearest-neighbor mining (round 6) —
    the CCMatrix/LASER bitext-mining criterion of Artetxe & Schwenk
    (ACL'19): for every source vector, its best target match scored
    by RATIO MARGIN — cosine divided by the mean of both sides'
    k-NN neighborhoods — which suppresses hubness (a generically
    central target that is "near everything" has a high denominator,
    so only matches that are near EACH OTHER specifically survive).
    The standard tool for mining parallel text across language
    groups; here the label column stands in for the language.

    Determinism contract (full oracle): vectors quantize to integer
    micro-units; dots/norms are exact long folds; per-pair cosine is
    quantized to cos_e6 = floor(1e6·dot/√(naa·nbb)) — double math on
    IDENTICAL integers, so identical in any IEEE engine — and every
    ranking, k-NN average (sum div k), and the margin itself
    (milli = (2000·c) div (avg_src + avg_tgt)) is integer arithmetic
    on those quantized values. Ties in rankings break on the
    candidate id.

    Scale shape: the two groups cross-score via a broadcast of the
    (typically much smaller) target side; both k-NN denominators come
    from rank windows partitioned by the owning vector (parallel
    across vectors, width = candidate count); one row per source
    survives a row_number window. At corpus scale the candidate
    generation is replaced by the IVF/LSH index probes (same scoring
    tail) — mining all-pairs is fixture-only.

    Returns (src_id, tgt_id, cos_e6, margin_milli) with
    margin_milli ≥ min_margin_milli (1000 = exactly average
    neighborhood affinity).
    """

    def ldot(a, b) -> F.Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    vq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0).cast("long"),
    )
    base = (
        parallelize_narrow(emb)
        .select(
            F.col(id_col).alias("id"), F.col(label_col).alias("lb"), vq.alias("v")
        )
        .withColumn("n2", ldot(F.col("v"), F.col("v")))
        # zero vectors have no cosine; both engines drop them before
        # the sqrt (floor(NaN) diverges between engines)
        .where(F.col("n2") > 0)
    )
    # ^ spread the single-file scan (r9): the |src|×|tgt| interpreted
    # dot folds below otherwise run on 1-2 cores
    src = base.where(F.col("lb") == src_label).select(
        F.col("id").alias("src_id"), F.col("v").alias("sv"), F.col("n2").alias("sn2")
    )
    tgt = base.where(F.col("lb") == tgt_label).select(
        F.col("id").alias("tgt_id"), F.col("v").alias("tv"), F.col("n2").alias("tn2")
    )
    dot = ldot(F.col("sv"), F.col("tv"))
    cos_e6 = F.floor(
        F.lit(1000000.0)
        * F.col("__dot").cast("double")
        / F.sqrt(F.col("sn2").cast("double") * F.col("tn2").cast("double"))
    ).cast("long")
    scored = (
        src.join(F.broadcast(tgt))
        .withColumn("__dot", dot)
        .select("src_id", "tgt_id", cos_e6.alias("c"))
    )
    w_src = Window.partitionBy("src_id").orderBy(F.desc("c"), F.asc("tgt_id"))
    w_tgt = Window.partitionBy("tgt_id").orderBy(F.desc("c"), F.asc("src_id"))
    ranked = scored.withColumn("r_s", F.row_number().over(w_src)).withColumn(
        "r_t", F.row_number().over(w_tgt)
    )
    # k-NN neighborhood means, integer: sum of each side's top-k cos_e6
    avg_s = (
        ranked.where(F.col("r_s") <= k)
        .groupBy("src_id")
        .agg(F.expr(f"CAST(sum(c) div {k} AS BIGINT)").alias("nb_s"))
    )
    avg_t = (
        ranked.where(F.col("r_t") <= k)
        .groupBy("tgt_id")
        .agg(F.expr(f"CAST(sum(c) div {k} AS BIGINT)").alias("nb_t"))
    )
    margined = (
        ranked.join(F.broadcast(avg_s), "src_id")
        .join(F.broadcast(avg_t), "tgt_id")
        .withColumn(
            "margin_milli",
            F.expr("CASE WHEN nb_s + nb_t > 0 THEN (2000 * c) div (nb_s + nb_t) END")
            .cast("long"),
        )
    )
    w_best = Window.partitionBy("src_id").orderBy(
        F.desc("margin_milli"), F.asc("tgt_id")
    )
    return (
        margined.withColumn("rn", F.row_number().over(w_best))
        .where((F.col("rn") == 1) & (F.col("margin_milli") >= min_margin_milli))
        .select(
            "src_id", "tgt_id", F.col("c").alias("cos_e6"), "margin_milli"
        )
    )


def mmr_rerank(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    pool: int = 50,
    lambda_milli: int = 700,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (round 6, Carbonell &
    Goldstein SIGIR'98): diversify the top-k — greedily pick the
    candidate maximizing λ·relevance − (1−λ)·max-similarity-to-already-
    selected. The standard de-redundancy step after first-pass ANN
    retrieval, and the same greedy used for diverse training-example
    selection.

    Determinism contract (full oracle): the margin_knn_match integer
    scheme — micro-quantized vectors, exact long dot folds,
    cos_e6 = floor(1e6·dot/√(n²·n²)) on identical integers — then
    every greedy score is
    (λ_milli·rel_e6 − (1000−λ_milli)·max_sim_e6) div 1000 with floor
    semantics and (score desc, id asc) ties, so the selection replays
    exactly as ten unrolled argmax CTEs in DuckDB.

    Scale shape: relevance is the X3 broadcast-query scan; the greedy
    runs on a top-`pool` candidate synopsis (pool ≤ 50 rows collected
    ONCE as BOUNDED driver state — the kmeans-centroid convention; the
    pool² pairwise sims are exact driver-side integer/IEEE arithmetic
    on those rows, identical to the distributed fold they replaced).
    At corpus scale the pool comes from an index probe; the greedy
    cost is k·pool either way.

    Returns (mmr_rank, vec_id, rel_e6, score_e6), k rows.
    """

    def ldot(a, b) -> F.Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    vq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0).cast("long"),
    )
    base = (
        emb.select(F.col(id_col).alias("id"), vq.alias("v"))
        .withColumn("n2", ldot(F.col("v"), F.col("v")))
        .where(F.col("n2") > 0)
    )
    q = base.where(F.col("id") == query_vec_id).select(
        F.col("v").alias("qv"), F.col("n2").alias("qn2")
    )
    cos = lambda d, na, nb: F.floor(  # noqa: E731
        F.lit(1000000.0)
        * d.cast("double")
        / F.sqrt(na.cast("double") * nb.cast("double"))
    ).cast("long")
    rel = (
        base.where(F.col("id") != query_vec_id)
        .join(F.broadcast(q))
        .withColumn("__dot", ldot(F.col("v"), F.col("qv")))
        .select(
            "id",
            "v",
            "n2",
            cos(F.col("__dot"), F.col("n2"), F.col("qn2")).alias("rel_e6"),
        )
    )
    cand = rel.orderBy(F.desc("rel_e6"), F.asc("id")).limit(pool)
    # bounded driver synopsis: ONE collect of the pool rows (id, rel,
    # vector, norm); the pool² pairwise sims are computed driver-side
    # on the exact same integers (r9 — the earlier distributed sims
    # join re-evaluated the whole relevance scan for a second action).
    # Python ints replay the long dot fold exactly PROVIDED |dot| stays
    # inside int64 (Spark's long fold wraps past 2^63 while Python's
    # arbitrary-precision int does not — unreachable at e6 quantization
    # of unit-ish 64-dim vectors, whose dots top out ~2^48, but the
    # equivalence is conditional on that range, not unconditional), and
    # floor(1e6·dot / sqrt(na·nb)) is the identical IEEE double
    # expression Spark evaluated — same inputs, same single-rounding
    # ops, same result.
    import math

    rows = cand.select("id", "rel_e6", "v", "n2").collect()
    rels = {r["id"]: r["rel_e6"] for r in rows}
    vecs = {r["id"]: (list(r["v"]), r["n2"]) for r in rows}
    sim: dict[tuple[int, int], int] = {}
    for ia, (va, na) in vecs.items():
        for ib, (vb, nb) in vecs.items():
            if ia == ib:
                continue
            dot = sum(x * y for x, y in zip(va, vb))
            sim[(ia, ib)] = math.floor(
                1000000.0 * float(dot) / math.sqrt(float(na) * float(nb))
            )
    mu = 1000 - lambda_milli
    selected: list[tuple[int, int, int, int]] = []
    chosen: list[int] = []
    for rnk in range(1, min(k, len(rels)) + 1):
        best_id, best_score = None, None
        for cid in sorted(rels):
            if cid in chosen:
                continue
            ms = max((sim[(cid, s)] for s in chosen), default=0)
            score = (lambda_milli * rels[cid] - mu * ms) // 1000
            if best_score is None or score > best_score:
                best_id, best_score = cid, score
        selected.append((rnk, best_id, rels[best_id], best_score))
        chosen.append(best_id)
    return emb.sparkSession.createDataFrame(
        selected, "mmr_rank long, vec_id long, rel_e6 long, score_e6 long"
    )


def ivf_literal_probe(
    emb: DataFrame,
    k_cells: int = 4,
    nprobe: int = 2,
    query_vec_id: int = 0,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF SERVE path — coarse cell assignment, cell pruning, and
    in-cell exact scoring — with the coarse centroids pinned to
    Lloyd's deterministic init (the ``k_cells`` lowest-id vectors) and
    every component an exact e6 integer (round 8): the
    `kmeans_literal_assign` trick applied to the full probe, so cell
    membership, the probed-cell choice, AND the candidate scores all
    replay bit-for-bit in any engine. The trained form
    (`topk_cosine_ivf`) keeps covering the iterative coarse trainer;
    this twin gates what a frozen IVF index executes per query.

    Ranking is by exact integer DOT product on the e6 grid (e12
    units) — on L2-normalized embeddings dot order == cosine order,
    and keeping the score integer is what makes the oracle exact.
    Ties break to the lower id. The query's ``nprobe`` nearest cells
    come from pure integer argmin over the same literal centroids
    (driver-side on the already-collected k_cells×dim ints — bounded
    planning state, not data).

    Distributed shape: centroids ride as one literal array (zero
    join); the cell filter prunes (k_cells−nprobe)/k_cells of the
    corpus BEFORE any scoring — the entire point of IVF — and the
    top-k is a TakeOrderedAndProject, never a global sort. Zero
    shuffles end to end. The cell value crosses an explode-of-one
    generator before the filter so the argmin is evaluated once (see
    inline note; a collapsed filter re-ran it interpreted, 14× the
    cost at the 100× rung).

    Returns (id_col, cell, dot_e12, rank) for the top-``topk``
    candidates in the probed cells, query row excluded.
    """
    emb = emb.where(F.col(vec_col).isNotNull())
    vq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0).cast("long"),
    )
    cents = [
        [int(x) for x in r["v"]]
        for r in emb.orderBy(id_col)
        .limit(k_cells)
        .select(vq.alias("v"))
        .collect()
    ]
    qrow = (
        emb.where(F.col(id_col) == query_vec_id).select(vq.alias("v")).first()
    )
    if qrow is None:
        raise ValueError(f"query {id_col}={query_vec_id} not found")
    qv = [int(x) for x in qrow["v"]]
    qd2 = [
        (sum((a - b) * (a - b) for a, b in zip(qv, cv)), cid)
        for cid, cv in enumerate(cents)
    ]
    probe_cells = [cid for _d2, cid in sorted(qd2)[:nprobe]]

    cent_arr = F.array(
        *[
            F.struct(
                F.lit(cid).cast("long").alias("cid"),
                F.array(*[F.lit(c).cast("long") for c in cv]).alias("cv"),
            )
            for cid, cv in enumerate(cents)
        ]
    )
    d2 = lambda cv: F.aggregate(  # noqa: E731 - exact integer ΣΔ²
        F.zip_with(F.col("__v"), cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # one-d2-per-centroid argmin (see kmeans_literal_assign): the
    # when()-fold form evaluated each d2 twice AND the cell filter's
    # scan pushdown re-ran the whole fold — together 34 s at the 100x
    # embeddings rung vs 6 s for this form
    best = F.array_min(
        F.transform(
            cent_arr,
            lambda c: F.struct(
                d2(c["cv"]).alias("d2"), c["cid"].alias("cid")
            ),
        )
    )
    qlit = F.array(*[F.lit(x).cast("long") for x in qv])
    dot = F.aggregate(
        F.zip_with(F.col("__v"), qlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # the cell column crosses a GENERATOR (explode of a 1-element
    # array) before the probe filter: a plain projected column gets
    # collapsed INTO the Filter, which evaluates the higher-order
    # argmin interpreted per row — measured 24 s vs 1.7 s at the 100x
    # embeddings rung; a generator output is a fresh attribute the
    # optimizer cannot inline, so the argmin runs exactly once
    # in-column dim guard (the jl_project precedent): a mixed-length
    # vector would otherwise NULL-pad zip_with into silent NULL dots
    dim = len(qv)
    guarded = F.when(F.size(F.col(vec_col)) == dim, vq).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"ivf_literal_probe: embedding length must be {dim}, got "
                ),
                F.size(F.col(vec_col)).cast("string"),
            )
        )
    )
    scored = (
        parallelize_narrow(emb)
        .where(F.col(id_col) != query_vec_id)
        .select(F.col(id_col), guarded.alias("__v"))
        .select(
            F.col(id_col),
            F.col("__v"),
            F.explode(F.array(best["cid"])).alias("cell"),
        )
        .where(F.col("cell").isin([int(c) for c in probe_cells]))
        .select(F.col(id_col), "cell", dot.alias("dot_e12"))
    )
    top = scored.orderBy(F.desc("dot_e12"), F.asc(id_col)).limit(topk)
    w = Window.partitionBy(F.col(id_col).isNotNull()).orderBy(
        F.desc("dot_e12"), F.asc(id_col)
    )
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def embedding_distance_profile(
    emb: DataFrame,
    sample_per_label: int = 40,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Intra-label pairwise-distance profile on a deterministic sample
    (round 8): for each label, the ``sample_per_label`` lowest-id
    vectors' exact pairwise squared-L2 distances on the e6 grid,
    summarized as min/p10/p50/p90/max order statistics — the
    "is this embedding space collapsing (all distances → 0) or
    hubbing (distance spread → nothing separates)" QA gate in front
    of every ANN/k-means consumer; X120 profiles norms (scale),
    X123 profiles per-dimension ranges, this profiles the GEOMETRY.

    Deterministic and exact: the sample is the id-order prefix per
    label (≤ n·(n−1)/2 pairs per label from a self-join — bounded by
    the literal sample size, never by the corpus), distances are
    exact integer Σ∆² (BIGINT-safe: ≤1e15 at dim 64), and the
    percentiles are rank-⌈q·n⌉ order statistics under the
    (d2, id_a, id_b) total order.

    Scale shape (round-9 fix of the r8 plan defect): labels are
    LOW-cardinality, so a row_number window partitioned by label over
    the raw vector-carrying table serializes every label's full row
    population — with its 64-long quantized vector — through one task
    (the exact pathology the trimmed_mean/hill tie-group rewrite
    excised at the 100× rung). The id-prefix sample instead runs on a
    two-level decomposition of a NARROW (label, rid) frame: (1) rids
    bucket by ``rid div 4096`` — rid is unique, so a bucket holds ≤
    4096 rows — and a per-(label, bucket) count cumsums over the
    per-label BUCKET frame (corpus/4096 narrow rows per label, the
    sprt/event_freshness day-decomposition precedent); (2) only
    buckets whose preceding cumulative count < k can contribute to
    the k lowest ids, and their union holds < k + 4096 rows per
    label, so the exact row_number prefix runs on that bounded frame.
    Vectors attach LAST, by broadcast-joining the ≤ k·|labels|
    sampled ids into the scan — no vector ever crosses a shuffle or a
    window.

    Non-numeric labels: the label casts to BIGINT with an explicit
    post-cast null filter (non-castable labels DROP, engine-identical
    — the oracle uses TRY_CAST + the same filter; a bare CAST would
    raise in DuckDB where Spark yields a silent NULL group).

    Returns (label, n_vecs, n_pairs, min_d2, p10_d2, p50_d2, p90_d2,
    max_d2) in e12 integer units.
    """
    vq = F.transform(
        F.col("__e").cast("array<double>"),
        lambda x: F.round(x * 1000000.0).cast("long"),
    )
    bucket_w = 4096
    base = (
        parallelize_narrow(emb)
        .select(
            F.col(label_col).cast("long").alias("lb"),
            F.col(id_col).cast("long").alias("rid"),
        )
        .where(F.col("lb").isNotNull())
    )
    bkts = base.groupBy(
        "lb", F.floor(F.col("rid") / bucket_w).cast("long").alias("bkt")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wb = Window.partitionBy("lb").orderBy("bkt")
    keep = (
        bkts.withColumn("prev", F.sum("cnt").over(wb) - F.col("cnt"))
        .where(F.col("prev") < sample_per_label)
        .select("lb", "bkt")
    )
    wn = Window.partitionBy("lb").orderBy("rid")
    sampled_ids = (
        base.withColumn(
            "bkt", F.floor(F.col("rid") / bucket_w).cast("long")
        )
        .join(F.broadcast(keep), ["lb", "bkt"])
        .withColumn("rk", F.row_number().over(wn))
        .where(F.col("rk") <= sample_per_label)
        .select("lb", "rid")
    )
    sampled = (
        parallelize_narrow(emb)
        .select(
            F.col(id_col).cast("long").alias("rid"),
            F.col(vec_col).alias("__e"),
        )
        .join(F.broadcast(sampled_ids), "rid")
        .select("lb", "rid", vq.alias("__v"))
    )
    a = sampled.select(
        F.col("lb").alias("la"), F.col("rid").alias("ia"), F.col("__v").alias("va")
    )
    b = sampled.select(
        F.col("lb").alias("lbb"), F.col("rid").alias("ib"), F.col("__v").alias("vb")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(b, (F.col("la") == F.col("lbb")) & (F.col("ia") < F.col("ib")))
        .select(F.col("la").alias("lb"), "ia", "ib", d2.alias("d2"))
    )
    wr = Window.partitionBy("lb").orderBy("d2", "ia", "ib")
    wn = Window.partitionBy("lb")
    ranked = pairs.withColumn("prk", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    pick = lambda q: F.max(  # noqa: E731 - order stat at rank ⌈q·n⌉
        F.when(
            F.col("prk") == F.expr(f"cast(ceil({q} * n) as bigint)"),
            F.col("d2"),
        )
    )
    n_vecs = sampled.groupBy("lb").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    return (
        ranked.groupBy("lb")
        .agg(
            F.max("n").cast("long").alias("n_pairs"),
            F.min("d2").cast("long").alias("min_d2"),
            pick(0.1).cast("long").alias("p10_d2"),
            pick(0.5).cast("long").alias("p50_d2"),
            pick(0.9).cast("long").alias("p90_d2"),
            F.max("d2").cast("long").alias("max_d2"),
        )
        .join(n_vecs, "lb")
        .select(
            F.col("lb").alias(label_col),
            "n_vecs",
            "n_pairs",
            "min_d2",
            "p10_d2",
            "p50_d2",
            "p90_d2",
            "max_d2",
        )
    )


def embedding_centroid_drift(
    emb: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid drift between the id-order FIRST and SECOND
    half of each label's vectors (round 9): the embedding cousin of
    X129's top-terms drift and X89's value drift — if a label's
    early-ingest centroid and late-ingest centroid have moved apart,
    the upstream embedder or the source mix changed mid-corpus, and
    every ANN index / k-means fit trained on the early half silently
    degrades on the late half.

    Exact integers end to end: components quantize to the e6 grid,
    per-(label, half, dim) sums are exact BIGINT, the centroid mean
    is a truncating integer division (Spark `div` == DuckDB `//` on
    integers — both truncate toward zero), and the drift is the exact
    squared L2 between the two integer mean vectors (e12 units).

    Scale shape: the half boundary is the per-label MEDIAN rid from
    the rid-bucket decomposition on a narrow (label, rid) frame (the
    X129/X139 precedent — rid div 4096 buckets hold ≤4096 rows, the
    boundary bucket alone is ranked exactly), broadcast back; per-dim
    sums ride a posexplode with the quantize INLINED into the
    generator (the round-9 InferFiltersFromGenerate lesson) into a
    map-side-combinable groupBy on (label, half, dim). No data-scale
    window, no vector through any sort.

    Returns (label, n_first, n_second, centroid_d2_e12) for labels
    with both halves non-empty.
    """
    bucket_w = 4096
    narrow = (
        parallelize_narrow(emb)
        .select(
            F.col(label_col).cast("long").alias("lb"),
            F.col(id_col).cast("long").alias("rid"),
        )
        .where(F.col("lb").isNotNull())
    )
    bkts = narrow.groupBy(
        "lb", F.floor(F.col("rid") / bucket_w).cast("long").alias("bkt")
    ).agg(F.count(F.lit(1)).cast("long").alias("__c"))
    wb = Window.partitionBy("lb").orderBy("bkt")
    cumb = (
        bkts.withColumn("cum", F.sum("__c").over(wb))
        .withColumn("n", F.sum("__c").over(Window.partitionBy("lb")))
        .withColumn("__tgt", F.expr("cast(ceil(n / 2.0) as bigint)"))
    )
    boundary = cumb.where(
        (F.col("cum") >= F.col("__tgt"))
        & (F.col("cum") - F.col("__c") < F.col("__tgt"))
    ).select(
        "lb", "bkt", (F.col("cum") - F.col("__c")).alias("__prev"), "__tgt"
    )
    wn = Window.partitionBy("lb").orderBy("rid")
    thr = (
        narrow.withColumn(
            "bkt", F.floor(F.col("rid") / bucket_w).cast("long")
        )
        .join(F.broadcast(boundary), ["lb", "bkt"])
        .withColumn("rk", F.row_number().over(wn))
        .where(F.col("__prev") + F.col("rk") == F.col("__tgt"))
        .select("lb", F.col("rid").alias("__thr"))
    )
    exploded = (
        parallelize_narrow(emb)
        .select(
            F.col(label_col).cast("long").alias("lb"),
            F.col(id_col).cast("long").alias("rid"),
            F.col(vec_col).alias("__e"),
        )
        .where(F.col("lb").isNotNull())
        .join(F.broadcast(thr), "lb")
        .select(
            "lb",
            F.when(F.col("rid") <= F.col("__thr"), 1)
            .otherwise(2)
            .alias("half"),
            F.posexplode(
                F.transform(
                    F.col("__e").cast("array<double>"),
                    lambda x: F.round(x * 1000000.0).cast("long"),
                )
            ).alias("pos", "v"),
        )
    )
    sums = exploded.groupBy("lb", "half", "pos").agg(
        F.sum("v").cast("long").alias("__s"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    means = sums.groupBy("lb", "pos").agg(
        F.max(F.when(F.col("half") == 1, F.expr("__s div __n"))).alias("m1"),
        F.max(F.when(F.col("half") == 2, F.expr("__s div __n"))).alias("m2"),
        F.max(F.when(F.col("half") == 1, F.col("__n"))).alias("n1"),
        F.max(F.when(F.col("half") == 2, F.col("__n"))).alias("n2"),
    )
    return (
        means.where(F.col("m1").isNotNull() & F.col("m2").isNotNull())
        .groupBy("lb")
        .agg(
            F.max("n1").cast("long").alias("n_first"),
            F.max("n2").cast("long").alias("n_second"),
            F.sum(
                (F.col("m1") - F.col("m2")) * (F.col("m1") - F.col("m2"))
            )
            .cast("long")
            .alias("centroid_d2_e12"),
        )
        .select(
            F.col("lb").alias(label_col),
            "n_first",
            "n_second",
            "centroid_d2_e12",
        )
    )

"""Distributed linear algebra over embedding columns — PCA via
covariance partials.

The classic two-pass layout for tall-skinny matrices (n rows × d≈64
dims, n unbounded): each partition reduces its rows to ONE partial
(count, Σx, ΣxxT) inside an Arrow-batched mapInPandas — d² + d + 1
doubles per partition, independent of row count — the driver sums the
partials in canonical partition order, eigendecomposes the d×d
covariance (microseconds at embedding dims), and ships the top-q
eigenvectors back inside a broadcast for the projection pass. Nothing
about this changes at 100 TB: the shuffle-free partial pass scales
with executors, driver state stays d², and the projection is one
numpy matmul per Arrow batch.

Determinism: float32 inputs make every pairwise product exactly
representable in float64; partials are summed on the driver sorted by
partition id, numpy's eigh is deterministic, and each eigenvector's
sign is fixed by convention (largest-|component| made positive), so
repeated runs produce bit-identical components. Downstream registry
aggregations quantize scores to integer micro-units before summing —
exact integer sums carry no accumulation-order drift.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..utils import parallelize_narrow

PARTIAL_SCHEMA = "pid int, n long, s array<double>, ss array<double>"


def covariance_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One row per partition: (pid, n, Σx as s[d], ΣxxT flattened as
    ss[d*d]). Arrow-batched; batches within a partition accumulate
    locally so the output is exactly one partial per non-empty
    partition regardless of Arrow batch size."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        n = 0
        s = None
        ss = None
        for pdf in batches:
            # a single NULL vector would turn np.asarray into an object
            # array and crash the whole pass — drop them like the
            # sibling vector operators do
            pdf = pdf.dropna(subset=["v"])
            if pdf.empty:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]],
                dtype=np.float64,
            )
            n += x.shape[0]
            bs = x.sum(axis=0)
            bss = x.T @ x
            s = bs if s is None else s + bs
            ss = bss if ss is None else ss + bss
        if n == 0:
            return
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame(
            {"pid": [pid], "n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
        )

    return (
        df.where(F.col(vec_col).isNotNull())
        .select(F.col(vec_col).alias("v"))
        .mapInPandas(part, schema=PARTIAL_SCHEMA)
    )


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", q: int = 4
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Fit PCA: returns (components q×d, explained_variance q, mean d,
    n). Collects one partial per partition (bounded driver state),
    sums them sorted by partition id (canonical order → bit-stable
    covariance), then eigh on the d×d matrix."""
    parts = covariance_partials(df, vec_col).collect()
    if not parts:
        raise ValueError("pca_fit: empty input")
    parts.sort(key=lambda r: r["pid"])
    n = sum(r["n"] for r in parts)
    if n < 2:
        raise ValueError("pca_fit: need at least 2 rows")
    d = len(parts[0]["s"])
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in parts:
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(d, d)
    mean = s / n
    cov = (ss - np.outer(s, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:q]
    comps = evecs[:, order].T.copy()
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, evals[order], mean, int(n)


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    q: int = 4,
    out_col: str = "scores",
) -> DataFrame:
    """Append the top-q principal-component scores of `vec_col` as an
    array<double>. Components/mean travel as an explicit sparkContext
    broadcast (one ship per executor, not per task closure — the r3
    k-means lesson), and the projection is one centered matmul per
    Arrow batch."""
    comps, _evals, mean, _n = pca_fit(df, vec_col, q)
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((comps, mean))

    @F.pandas_udf("array<double>")
    def proj(vs: pd.Series) -> pd.Series:
        c, m = bc.value
        x = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in vs], dtype=np.float64
        )
        scores = (x - m) @ c.T
        return pd.Series(list(scores))

    return df.withColumn(out_col, proj(F.col(vec_col)))


def pca_label_summary(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    q: int = 4,
) -> DataFrame:
    """Registry surface: per-label mean of each PC score. Scores are
    quantized to integer micro-units BEFORE aggregation (exact BIGINT
    sums — no float accumulation-order drift), then divided once.
    Returns (label, n, pc1..pcq) with means rounded to 6 dp."""
    proj = pca_project(df, vec_col, q, out_col="__sc")
    micro = [
        F.round(F.col("__sc")[i] * 1_000_000.0).cast("bigint").alias(f"__m{i}")
        for i in range(q)
    ]
    base = proj.select(F.col(label_col).alias("label"), *micro)
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.round(
            F.sum(f"__m{i}").cast("double")
            / F.count(F.lit(1)).cast("double")
            / 1_000_000.0,
            6,
        ).alias(f"pc{i + 1}")
        for i in range(q)
    ]
    return base.groupBy("label").agg(*aggs)


def zca_whiten(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "whitened",
    eps: float = 1e-6,
) -> DataFrame:
    """ZCA whitening: decorrelate an embedding column so its sample
    covariance is ~identity (W = U diag(1/√(λ+ε)) Uᵀ) while staying as
    close to the original basis as any whitening can — the standard
    preprocessing before cosine-based retrieval/dedup when raw
    embedding dimensions are correlated (anisotropy collapses cosine
    contrast).

    Same scale shape as pca_project: one shuffle-free covariance pass,
    a d×d eigh on the driver, and one matmul per Arrow batch with the
    transform shipped via explicit broadcast.
    """
    comps, evals, mean, _n = pca_fit(df, vec_col, q=10**9)
    w = comps.T @ np.diag(1.0 / np.sqrt(evals + eps)) @ comps
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((w, mean))

    @F.pandas_udf("array<double>")
    def _apply(vs: pd.Series) -> pd.Series:
        m, mu = bc.value
        x = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in vs], dtype=np.float64
        )
        return pd.Series(list((x - mu) @ m.T))

    return df.withColumn(out_col, _apply(F.col(vec_col)))


def jl_project(
    emb: DataFrame,
    k_out: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson–Lindenstrauss random-SIGN projection to ``k_out`` dims
    (round 7, per Achlioptas 2003: ±1 entries preserve pairwise
    distances like Gaussian ones) — the cheap dimensionality reducer
    in front of ANN/clustering when PCA's two-pass fit is overkill or
    the corpus is still growing: distances shrink by the constant
    √(dim/k_out), which rank-based consumers (top-k, LSH bucketing,
    k-means argmin) never see.

    Engine-exact: components scale to e6 BIGINT, the sign matrix is
    md5-derived (sign(j,i) = +1 iff the first hex char of
    md5("j:i") is even — the _md5_hyperplanes convention, no RNG, no
    seed shipping), and each output component is an exact integer
    Σ ±x_i — bit-identical in any engine, no float anywhere.

    Scale shape: the 16×64 sign matrix is baked into ONE parsed SQL
    expression (literals, not py4j calls — the embedding_lsh
    plan-build lesson), the projection is a narrow per-row fold, and
    the output explodes to (id, j, comp) rows for stable hashing.
    Zero shuffle, zero Python, zero driver state. Vectors whose
    length differs from ``dim`` RAISE (inside the projected column, so
    the optimizer cannot prune the guard — the dtw max_cells lesson)
    rather than silently NULL-padding through zip_with; the oracle
    derives its range from len(embedding), so a silent mismatch would
    diverge instead of fail loudly.

    Returns (id_col, j, comp) — k_out rows per input vector.
    """
    import hashlib

    def sign(j: int, i: int) -> int:
        return 1 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1

    rows = []
    for j in range(k_out):
        arr = ", ".join(f"{sign(j, i)}L" for i in range(dim))
        rows.append(
            f"named_struct('j', {j}L, 'comp', "
            f"aggregate(zip_with(__v, array({arr}), (a, s) -> a * s), "
            f"0L, (acc, x) -> acc + x))"
        )
    proj = F.expr("array(" + ", ".join(rows) + ")")
    vq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0).cast("long"),
    )
    guarded = F.when(F.size(F.col(vec_col)) == dim, vq).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"jl_project: embedding length must be {dim}, got "),
                F.size(F.col(vec_col)).cast("string"),
            )
        )
    )
    return (
        parallelize_narrow(emb.where(F.col(vec_col).isNotNull()))
        .select(F.col(id_col), guarded.alias("__v"))
        .select(F.col(id_col), F.explode(proj).alias("__p"))
        .select(id_col, F.col("__p.j").alias("j"), F.col("__p.comp").alias("comp"))
    )


def embedding_norm_profile(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label profile of squared embedding norms (round 7) — the
    embedding-QA readout every vector pipeline wants before trusting
    cosine anything: a label whose norms collapse toward 0 (dead
    encoder head) or explode (un-normalized mix-in) poisons both the
    ANN distances (X3) and the e6 integer quantization the oracle
    twins rely on; the p50/p90 spread also says whether L2-normalizing
    is a no-op or a rescue.

    Exact integers end to end: ||v||² on e6-quantized components is an
    exact BIGINT (the kmeans_literal_assign magnitude argument), and
    p50/p90 are order statistics at rank ⌈q·n⌉ via the total order
    (norm², vec_id) — no interpolation, engine-identical. The mean is
    an integer floor-div with the sum widened to decimal(38,0) first
    (n2 ≈ 6e13 for unit-norm e6 64-dim vectors, so ~1e5 vectors per
    label would overflow a BIGINT sum; the oracle widens to HUGEINT
    the same way).

    One narrow fold + tie-group order statistics on the label key
    (no data-scale rank window — see inline note). Returns
    (label, n_vecs, mean_norm2, p50_norm2, p90_norm2) with norms² in
    e12 integer units.
    """
    vq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0).cast("long"),
    )
    n2 = F.aggregate(
        F.zip_with(vq, vq, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    base = (
        parallelize_narrow(emb)
        .where(F.col(label_col).isNotNull())
        .select(
            F.col(label_col).cast("long").alias("lb"),
            n2.alias("n2"),
            F.col("vec_id").cast("long").alias("rid"),
        )
    )
    # tie-group order statistics (round-9 sweep, the trimmed_mean /
    # activation_latency rule): the value at rank ⌈q·n⌉ under
    # (n2, rid) order depends only on per-value cumulative counts, so
    # a map-side-combinable groupBy(lb, n2) + cumsum over the
    # distinct-norm frame replaces the row-rank window that serialized
    # each label's full population through one task. Residual: the
    # cumsum still sorts one label's DISTINCT norms in one task —
    # narrow 24-byte rows, and exact e12 norms of real embeddings
    # collapse heavily; the row-rank form had no such reduction.
    cells = base.groupBy("lb", "n2").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    wg = Window.partitionBy("lb").orderBy("n2")
    wt = Window.partitionBy("lb")
    ranked = cells.withColumn("cum", F.sum("__c").over(wg)).withColumn(
        "n", F.sum("__c").over(wt)
    )
    pick = lambda q: F.min(  # noqa: E731 - tie-group order statistic
        F.when(
            F.col("cum") >= F.expr(f"cast(ceil({q} * n) as bigint)"),
            F.col("n2"),
        )
    )
    return (
        ranked.groupBy("lb")
        .agg(
            F.max("n").cast("long").alias("n_vecs"),
            F.expr(
                "sum(cast(n2 as decimal(38,0)) * __c) div sum(__c)"
            )
            .cast("long")
            .alias("mean_norm2"),
            pick(0.5).cast("long").alias("p50_norm2"),
            pick(0.9).cast("long").alias("p90_norm2"),
        )
        .select(
            F.col("lb").alias(label_col),
            "n_vecs",
            "mean_norm2",
            "p50_norm2",
            "p90_norm2",
        )
    )


def embedding_clip_bounds(
    emb: DataFrame,
    p_low: float = 0.01,
    p_high: float = 0.99,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-DIMENSION clipping bounds for the embedding matrix (round
    8): exact p01/p99 (plus min/max) of every component on the e6
    integer grid — the QA pass that decides the clip range before
    int8/PQ quantization (X3's `quantize_embeddings` assumes a range;
    a single outlier dimension silently eats the whole quantizer's
    resolution, and this profile is how you catch it). The column-wise
    companion of `embedding_norm_profile`'s row-wise norms.

    Exact integers end to end: components quantize to e6 BIGINT
    (the package-wide convention), and the percentiles are order
    statistics at rank ⌈q·n⌉ under the total order (value, vec_id) —
    no interpolation, engine-identical.

    Scale shape: posexplode → map-side-combinable (pos, value) tie
    counts → cumsum over a per-dimension frame bounded by the e6
    VALUE RANGE (≤ ~2e6 rows/dim for L2-normalized components),
    independent of corpus size. Output is dim rows.

    Returns (pos, n_vecs, min_e6, p_low_e6, p_high_e6, max_e6).
    """
    vq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0).cast("long"),
    )
    # vq INLINED into the posexplode: generating from a NAMED array
    # projection lets InferFiltersFromGenerate push `size(__v) > 0`
    # (and the whole transform) into the scan Filter, re-running the
    # quantization per row pre-shuffle (the top_terms_drift lesson,
    # measured 10x on the tokenize shape at the 100x rung)
    base = parallelize_narrow(emb).select(
        F.col(id_col).cast("long").alias("rid"),
        F.posexplode(vq).alias("pos", "v"),
    )
    # tie-group order statistics (round-9 sweep): per-(pos, v) counts
    # + cumsum over the distinct-value frame. L2-normalized components
    # live in [-1, 1], so the e6 grid admits at most ~2e6 distinct
    # values per dimension — the frame is bounded by the VALUE RANGE,
    # independent of corpus size, where the previous row-rank window
    # serialized every row of a dimension through one task.
    cells = base.groupBy("pos", "v").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    wg = Window.partitionBy("pos").orderBy("v")
    wt = Window.partitionBy("pos")
    ranked = cells.withColumn("cum", F.sum("__c").over(wg)).withColumn(
        "n", F.sum("__c").over(wt)
    )
    pick = lambda q: F.min(  # noqa: E731 - tie-group order statistic
        F.when(
            F.col("cum") >= F.expr(f"cast(ceil({q} * n) as bigint)"),
            F.col("v"),
        )
    )
    return (
        ranked.groupBy("pos")
        .agg(
            F.max("n").cast("long").alias("n_vecs"),
            F.min("v").cast("long").alias("min_e6"),
            pick(p_low).cast("long").alias("p_low_e6"),
            pick(p_high).cast("long").alias("p_high_e6"),
            F.max("v").cast("long").alias("max_e6"),
        )
        .select(
            F.col("pos").cast("int").alias("pos"),
            "n_vecs",
            "min_e6",
            "p_low_e6",
            "p_high_e6",
            "max_e6",
        )
    )


def pca_literal_project(
    emb: DataFrame,
    q: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The PCA SERVE path with the projection matrix pinned to its
    deterministic init — the ``q`` lowest-id vectors on the e6 grid —
    and the centering vector pinned to their element-wise floor mean
    (round 9): the X121/X122 literal-synopsis trick applied to linear
    projection, closing the PCA family's oracle gap the way
    `pq_literal_adc` closed PQ's. The trained form (`pca_project`,
    covariance partials + eigh) stays rows-only; THIS is what a
    serving layer executes once the matrix is frozen — a centered
    integer matmul, replayable bit-for-bit in any engine:

        s_j = Σ_d (x_d·1e6 − m_d) · c_{j,d}   (exact BIGINT, e12 units)

    Distributed shape: the q×dim matrix and the mean ride as literal
    arrays (one bounded q-row driver collect — the same k×dim bound
    as kmeans_literal_assign); the projection is q aggregate folds
    per row. Zero joins, zero shuffles, zero Python. Magnitudes:
    |diff| ≤ 2e6 × |c| ≤ 2e6 × dim 64 ≈ 2.6e14 — inside BIGINT.

    In-column dim guard per the jl_project convention. Returns
    (id_col, s0_e12 .. s{q-1}_e12), fixed column order.

    Reference basis: standard frozen-matrix PCA serving (two-pass
    tall-skinny PCA per `pca_fit`); no reference-repo counterpart —
    §2b extension family X56/X140.
    """
    from ..utils import parallelize_narrow

    emb = emb.where(F.col(vec_col).isNotNull())
    vq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0).cast("long"),
    )
    seeds = [
        [int(x) for x in r["v"]]
        for r in emb.orderBy(id_col).limit(q).select(vq.alias("v")).collect()
    ]
    if len(seeds) < q:
        raise ValueError(f"pca_literal_project: need >= {q} rows")
    dim = len(seeds[0])
    if any(len(s) != dim for s in seeds):
        raise ValueError("pca_literal_project: seed dim mismatch")
    # element-wise TRUNCATING mean: DuckDB's integer `//` truncates
    # toward zero (-7 // 4 = -1) where python's floors (-2) — match
    # DuckDB/Spark-div semantics explicitly for negative sums
    def _tdiv(a: int, b: int) -> int:
        return a // b if a >= 0 else -((-a) // b)

    mean = [_tdiv(sum(s[d] for s in seeds), q) for d in range(dim)]
    mlit = F.array(*[F.lit(int(x)).cast("long") for x in mean])
    guarded = F.when(F.size(F.col(vec_col)) == dim, vq).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"pca_literal_project: embedding length must be {dim},"
                    " got "
                ),
                F.size(F.col(vec_col)).cast("string"),
            )
        )
    )
    diff = F.zip_with(F.col("__v"), mlit, lambda a, b: a - b)
    score_cols = []
    for j, cj in enumerate(seeds):
        clit = F.array(*[F.lit(int(x)).cast("long") for x in cj])
        s = F.aggregate(
            F.zip_with(F.col("__d"), clit, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        score_cols.append(s.cast("long").alias(f"s{j}_e12"))
    return (
        parallelize_narrow(emb)
        .select(F.col(id_col), guarded.alias("__v"))
        .select(F.col(id_col), diff.alias("__d"))
        .select(F.col(id_col), *score_cols)
    )

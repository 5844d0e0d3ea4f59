"""Product quantization — the memory-compression half of ANN at scale.

IVF (similarity.py / ann_index.py) prunes WHICH vectors a probe reads;
PQ shrinks WHAT each vector costs: split every (L2-normalized) vector
into `m` subvectors, k-means each subspace into `k` codewords, and
store only the m codeword ids — m bytes/vector at k ≤ 256 vs 4·dim
for float32, a dim·4/m× compression (32× at dim 64, m 8). Queries
score against codes with an asymmetric distance computation (ADC):
the query's per-subspace distance to every codeword is a tiny m×k
driver-side table, and a candidate's approximate distance is m table
lookups — no float vector is ever touched at query time. (Jégou,
Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — the standard composition is IVF for pruning + PQ for
memory; both halves live in this package.)

Distributed shape (the part that matters at 100 TB):

- Assignment (train + encode) is a VECTORIZED Arrow pass
  (`mapInPandas` + numpy einsum): an expression-tree argmin over m×k
  literal codewords was measured to blow up Catalyst analysis past
  m·k ≈ 256 (minutes of planning for zero execution win), which is
  exactly the "built-ins genuinely can't express it" bar the package
  doctrine sets for dropping to the Arrow seam. Nothing shuffles.
- Training is Lloyd's over ALL m subspaces at once: each Arrow batch
  emits per-(subspace, codeword) partial sums + counts, the merge is
  a map-side-combined groupBy of m×k×(dim/m) = k×dim rows, and the
  driver holds only the codebook tensor (k×dim floats) between
  iterations. Codebook means are rounded to 9 dp each iteration so
  partial-sum merge order cannot leak float drift into code
  assignments across runs. Like IVF centroids, deployments train on
  a sample.
- ADC scoring is pure JVM: the m×k distance table rides as literal
  arrays and scoring is m `element_at` lookups + a sum — zero Python
  in the hot path, TakeOrderedAndProject top-k.

Vectors are L2-normalized first, so squared-L2 ranking equals cosine
ranking (‖a−b‖² = 2 − 2·cos on the unit sphere) and recall is
measured directly against `topk_cosine`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_rows(x):
    import numpy as np

    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return x / n


def _codes_for(x, books_arr):
    """(n×dim normalized) → (n×m) argmin codes; ties to first codeword
    (np.argmin), matching the k-means convention."""
    import numpy as np

    m, k, dsub = books_arr.shape
    out = np.empty((x.shape[0], m), dtype="int32")
    for s in range(m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        c = books_arr[s]  # k × dsub
        d = (
            (xs * xs).sum(axis=1, keepdims=True)
            - 2.0 * xs @ c.T
            + (c * c).sum(axis=1)
        )
        out[:, s] = np.argmin(d, axis=1)
    return out


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 256,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train the m×k codebook tensor. Deterministic: subspace s of the
    k lowest-id vectors initializes codebook s (k > n keeps the
    surplus codewords at their init, i.e. duplicated vectors — they
    simply never win an argmin tie-break). Dim must divide evenly by
    m (a silent remainder would drop trailing dimensions from every
    distance)."""
    import numpy as np

    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("cannot train PQ on an empty frame")
    dim = int(first["d"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    init = emb.orderBy(id_col).limit(k).select(
        F.col(vec_col).cast("array<double>").alias("v")
    ).collect()
    seed = _norm_rows(np.array([r["v"] for r in init], dtype="float64"))
    if len(seed) < k:  # tiny corpus: cycle the available vectors
        reps = -(-k // len(seed))
        seed = np.tile(seed, (reps, 1))[:k]
    books = np.stack(
        [seed[:, s * dsub : (s + 1) * dsub].copy() for s in range(m)]
    )  # m × k × dsub

    sums_schema = "s int, c int, pos int, vsum double, cnt long"

    for _ in range(iters):
        books_now = books.copy()

        def partial_sums(batches):
            import pandas as pd

            for pdf in batches:
                x = _norm_rows(
                    np.array(pdf[vec_col].tolist(), dtype="float64")
                )
                codes = _codes_for(x, books_now)
                rows = []
                for s in range(m):
                    xs = x[:, s * dsub : (s + 1) * dsub]
                    for c in np.unique(codes[:, s]):
                        mask = codes[:, s] == c
                        vs = xs[mask].sum(axis=0)
                        n = int(mask.sum())
                        rows.extend(
                            (s, int(c), p, float(vs[p]), n)
                            for p in range(dsub)
                        )
                yield pd.DataFrame(
                    rows, columns=["s", "c", "pos", "vsum", "cnt"]
                )

        partials = (
            emb.select(F.col(vec_col))
            .mapInPandas(partial_sums, schema=sums_schema)
            .groupBy("s", "c", "pos")
            .agg(F.sum("vsum").alias("vs"), F.sum("cnt").alias("n"))
            .collect()
        )
        for r in partials:
            books[r["s"], r["c"], r["pos"]] = r["vs"] / r["n"]
        # quantize driver state: merge order of float partials must not
        # leak run-to-run drift into later argmin decisions
        books = np.round(books, 9)
    return [[list(map(float, cw)) for cw in sub] for sub in books]


def pq_encode(
    emb: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — one narrow Arrow pass, no shuffle."""
    import numpy as np

    books_arr = np.array(books, dtype="float64")

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            x = _norm_rows(np.array(pdf[vec_col].tolist(), dtype="float64"))
            codes = _codes_for(x, books_arr)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes.tolist())}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} long, codes array<int>"
    )


def pq_topk(
    codes_df: DataFrame,
    books: list[list[list[float]]],
    query_vec: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by ADC distance from a PQ-coded table.

    The m×k query→codeword distance table is computed on the driver
    (m·k·dsub flops — planning state) and scored JVM-side as m literal
    `element_at` lookups. Returns (id, approx_dist, rank) ascending,
    deterministic (dist, id) tie-break.
    """
    import math

    m = len(books)
    dsub = len(books[0][0])
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    q = [x / qn for x in query_vec]
    table = [
        [
            sum(
                (q[s * dsub + p] - books[s][j][p]) ** 2
                for p in range(dsub)
            )
            for j in range(len(books[s]))
        ]
        for s in range(m)
    ]
    dist = None
    for s in range(m):
        lut = F.array(*[F.lit(float(x)) for x in table[s]])
        term = F.element_at(lut, F.element_at("codes", s + 1) + 1)
        dist = term if dist is None else dist + term
    scored = codes_df.select(
        F.col(id_col), F.round(dist, 9).alias("approx_dist")
    )
    out = scored.orderBy(F.asc("approx_dist"), F.asc(id_col)).limit(topk)
    from pyspark.sql import Window

    w = Window.partitionBy(F.col(id_col).isNotNull()).orderBy(
        F.asc("approx_dist"), F.asc(id_col)
    )
    return out.withColumn("rank", F.row_number().over(w).cast("long"))


def pq_topk_rerank(
    codes_df: DataFrame,
    emb: DataFrame,
    books: list[list[list[float]]],
    query_vec: list[float],
    topk: int = 10,
    shortlist_factor: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The deployment form: ADC generates a `shortlist_factor`·topk
    candidate set from codes alone, then ONLY those ids are re-scored
    exactly against their float vectors (a broadcast semi-join — the
    full-precision table is touched for shortlist-sized point reads,
    the PQ memory win is preserved for the scan). Standard PQ practice:
    quantization error costs recall at the top-k boundary, and a small
    exact re-rank buys most of it back (Jégou et al. §V). Returns
    (id, cos_sim, rank) like topk_cosine."""
    from ..functions.vectors import cosine_similarity_col
    from .similarity import _rank_topk

    short = pq_topk(
        codes_df, books, query_vec, topk=topk * shortlist_factor,
        id_col=id_col,
    ).select(id_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = (
        emb.join(F.broadcast(short), id_col)
        .select(
            F.col(id_col),
            cosine_similarity_col(
                F.col(vec_col).cast("array<double>"), q
            ).alias("__cos"),
        )
    )
    return _rank_topk(scored, id_col, topk)


def write_ivfpq_index(
    emb: DataFrame,
    path: str,
    n_centroids: int | None = 16,
    m: int = 16,
    k: int = 64,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the full Jégou composition — IVF prunes WHICH cells
    a probe reads, PQ shrinks WHAT each entry costs: codes are
    hive-partitioned by coarse cell (``path/codes/cell=N``), with the
    coarse centroids and the PQ codebooks as sidecars. The on-disk
    entry is (id, m codes) — the float vectors stay in the SOURCE
    table and are touched only for the final shortlist re-rank, which
    is the whole point: the index a probe scans is dim·4/m× smaller
    than the vectors it indexes."""
    import json as _json
    import os as _os

    from .similarity import ivf_assignments

    centroids, assigned = ivf_assignments(emb, n_centroids, id_col, vec_col)
    books = pq_train(emb, m=m, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    coded = pq_encode(
        # ivf_assignments rebinds the vector as __vec
        assigned.select(id_col, F.col("__vec").alias(vec_col), "cell"),
        books,
        id_col,
        vec_col,
    )
    # one narrow re-join to carry the cell (pq_encode projects it away;
    # the join side is the assignment's (id, cell) pair — key + int)
    cells = assigned.select(id_col, "cell")
    (
        coded.join(cells, id_col)
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(f"{path}/codes")
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    _os.makedirs(path, exist_ok=True)
    with open(_os.path.join(path, "books.json"), "w") as fh:
        _json.dump(books, fh)


def topk_ivfpq(
    spark,
    path: str,
    emb: DataFrame,
    query_vec: list[float],
    topk: int = 10,
    n_probe: int = 4,
    shortlist_factor: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the materialized IVF-PQ index: pick `n_probe` cells
    against the centroid sidecar (driver planning state), scan ONLY
    those cells' code files (`cell IN (...)` partition filter), score
    with JVM ADC lookups, and exact-re-rank the shortlist against the
    source table (broadcast point reads). Probe cost scales with the
    probed fraction × m bytes per entry — the smallest scan any ANN
    form in this package does."""
    import json as _json
    import math
    import os as _os

    with open(_os.path.join(path, "books.json")) as fh:
        books = _json.load(fh)
    cents = spark.read.parquet(f"{path}/centroids").collect()
    qnorm = math.sqrt(sum(x * x for x in query_vec)) or 1.0

    def cos(cvec):
        cn = math.sqrt(sum(x * x for x in cvec)) or 1.0
        return sum(a * b for a, b in zip(query_vec, cvec)) / (cn * qnorm)

    probe = sorted(cents, key=lambda r: (-cos(r["cvec"]), r["cell"]))[:n_probe]
    cells = [r["cell"] for r in probe]
    codes = (
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("cell").isin(cells))
        .select(id_col, "codes")
    )
    short = pq_topk(
        codes, books, query_vec, topk=topk * shortlist_factor, id_col=id_col
    ).select(id_col)
    from ..functions.vectors import cosine_similarity_col
    from .similarity import _rank_topk

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.join(F.broadcast(short), id_col).select(
        F.col(id_col),
        cosine_similarity_col(F.col(vec_col).cast("array<double>"), q).alias(
            "__cos"
        ),
    )
    return _rank_topk(scored, id_col, topk)


def append_to_ivfpq_index(
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Add a batch to an existing IVF-PQ index — the ingest-time twin
    of `ann_index.append_to_ivf_index`, with the same authority rule
    doubled: the STORED coarse centroids assign cells and the STORED
    codebooks encode (re-deriving either from the batch would scatter
    one vector space across incompatible cells/codes). Per-batch cost
    is two narrow passes + a partitioned append; dimensionality is
    validated against the codebooks for every row. Quantization drift
    applies to both quantizers — rebuild when probe recall decays."""
    import json as _json
    import os as _os

    from .similarity import assign_cells

    spark = emb.sparkSession
    with open(_os.path.join(path, "books.json")) as fh:
        books = _json.load(fh)
    dim = len(books) * len(books[0][0])
    bad_dims = [
        r["d"]
        for r in emb.select(F.size(F.col(vec_col)).alias("d")).distinct().collect()
        if r["d"] != dim
    ]
    if bad_dims:
        raise ValueError(
            f"index at {path} encodes {dim}-dim vectors; refusing to "
            f"append dim(s) {sorted(bad_dims)}"
        )
    centroids = spark.read.parquet(f"{path}/centroids")
    assigned = assign_cells(emb, centroids, id_col, vec_col)
    coded = pq_encode(
        assigned.select(id_col, F.col("__vec").alias(vec_col), "cell"),
        books,
        id_col,
        vec_col,
    )
    (
        coded.join(assigned.select(id_col, "cell"), id_col)
        .write.partitionBy("cell")
        .mode("append")
        .parquet(f"{path}/codes")
    )


def pq_literal_adc(
    emb: DataFrame,
    m: int = 4,
    k_code: int = 8,
    query_vec_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The PQ ENCODE + ADC SCORE path with the codebook pinned to its
    deterministic init (subspace slices of the ``k_code`` lowest-id
    vectors) and every component scaled to an exact e6 integer — round
    8's oracle-replayable twin of the trained `pq_topk` pipeline, the
    `kmeans_literal_assign` trick applied to product quantization:
    per-subspace argmin and the asymmetric distance table are exact
    integer algebra (no float seam anywhere), so code assignment AND
    the ADC distance replay bit-for-bit in any engine. The trained
    form (`pq_search`) keeps covering Lloyd's-over-subspaces; this is
    the serving path a PQ index runs per query batch once the codebook
    is frozen.

    Distributed shape: the m×k_code codebook is ONE bounded
    k_code×dim driver collect baked into literal arrays (m·k_code=32
    codeword structs — far under the m·k≈256 Catalyst-analysis
    blow-up bar documented in this module's header); encode is a
    narrow per-row fold over subvector slices, ADC is m element_at
    lookups on a literal m×k_code integer table. Zero joins, zero
    shuffles, zero Python. Magnitudes: per-dim Δ² ≤ 1.6e13 × dsub(16)
    ≤ 2.6e14 per subspace, ×m(4) ≈ 1e15 — far inside BIGINT.

    Returns every row's (id_col, codes_csv, adc_d2): the code word per
    subspace as a comma-joined string plus the exact integer ADC
    distance to the query vector — gating encode and score together
    without a global sort (consumers TakeOrderedAndProject their own
    top-k).
    """
    # NULL vectors drop explicitly (both engines — the media-family
    # convention): a NULL among the lowest-id seeds would poison the
    # codebook, and the in-column dim guard must never fire on NULL
    emb = emb.where(F.col(vec_col).isNotNull())
    vq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1000000.0).cast("long"),
    )
    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("cannot build a PQ codebook on an empty frame")
    dim = int(first["d"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    seeds = [
        [int(x) for x in r["v"]]
        for r in emb.orderBy(id_col)
        .limit(k_code)
        .select(vq.alias("v"))
        .collect()
    ]
    qrow = (
        emb.where(F.col(id_col) == query_vec_id).select(vq.alias("v")).first()
    )
    if qrow is None:
        raise ValueError(f"query {id_col}={query_vec_id} not found")
    qv = [int(x) for x in qrow["v"]]

    def subspace_codewords(s: int) -> list[list[int]]:
        return [sv[s * dsub : (s + 1) * dsub] for sv in seeds]

    def d2_expr(slice_col, cw: list[int] | None, cw_col=None):
        lit = (
            cw_col
            if cw_col is not None
            else F.array(*[F.lit(c).cast("long") for c in cw])
        )
        return F.aggregate(
            F.zip_with(slice_col, lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    code_cols, adc_terms = [], []
    for s in range(m):
        sl = F.slice(F.col("__v"), s * dsub + 1, dsub)
        cws = subspace_codewords(s)
        # literal array-of-structs + one aggregate fold (the
        # kmeans_literal_assign shape): a chained when()-argmin would
        # re-reference every earlier candidate twice per level and blow
        # the expression tree up exponentially
        cw_arr = F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("j"),
                    F.array(*[F.lit(c).cast("long") for c in cw]).alias("cw"),
                )
                for j, cw in enumerate(cws)
            ]
        )
        # one-d2-per-codeword argmin via array_min over (d2, j)
        # structs (lexicographic = distance asc, lowest-j tie-break;
        # the when()-fold form evaluated each d2 twice per step)
        best = F.array_min(
            F.transform(
                cw_arr,
                lambda c: F.struct(
                    d2_expr(sl, None, c["cw"]).alias("d2"),
                    c["j"].alias("j"),
                ),
            )
        )
        code_cols.append(best["j"].alias(f"__c{s}"))
        table = [
            sum(
                (qv[s * dsub + p] - cw[p]) * (qv[s * dsub + p] - cw[p])
                for p in range(dsub)
            )
            for cw in cws
        ]
        lut = F.array(*[F.lit(int(x)).cast("long") for x in table])
        adc_terms.append((lut, f"__c{s}"))

    from ..utils import parallelize_narrow

    # in-column dim guard (the jl_project precedent): a mixed-length
    # vector would otherwise NULL-pad zip_with diffs into silent NULL
    # subspace distances and wrong codes instead of failing
    guarded = F.when(F.size(F.col(vec_col)) == dim, vq).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"pq_literal_adc: embedding length must be {dim}, got "),
                F.size(F.col(vec_col)).cast("string"),
            )
        )
    )
    coded = (
        parallelize_narrow(emb)
        .select(F.col(id_col), guarded.alias("__v"))
        .select(F.col(id_col), *code_cols)
    )
    adc = None
    for lut, c in adc_terms:
        term = F.element_at(lut, F.col(c) + 1)
        adc = term if adc is None else adc + term
    return coded.select(
        F.col(id_col),
        F.concat_ws(
            ",", *[F.col(f"__c{s}").cast("string") for s in range(m)]
        ).alias("codes_csv"),
        adc.cast("long").alias("adc_d2"),
    )

"""Materialized IVF index: the on-disk scale path for ANN search.

`similarity.topk_cosine_ivf` quantizes and probes in one job — right
for ad-hoc queries, but at 100 TB every probe would still scan the
whole corpus to recompute cell assignments. A real deployment
materializes the index ONCE:

- `write_ivf_index`: assign every vector to its nearest coarse
  centroid (broadcast argmax, narrow — see `similarity.
  ivf_assignments`) and write the table hive-partitioned by `cell`,
  with the tiny centroid table alongside. One shuffle (the
  partitioned write's file routing); vectors never move again.
- `topk_cosine_indexed`: pick the `n_probe` closest cells from the
  centroid sidecar (driver-side: n_centroids×dim floats — planning
  state), then read ONLY those cell directories. The `cell IN (...)`
  predicate is a partition filter, so the scan lists and reads
  n_probe/n_centroids of the files — the same pruning a 1000-executor
  cluster relies on (PartitionFilters pinned in tests/test_ann_index.py).

Probe cost thus scales with the probed fraction of the corpus, not the
corpus; recall equals the in-memory IVF variant by construction (same
quantizer, same probe rule).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity_col
from .similarity import _rank_topk, ivf_assignments


def write_ivf_index(
    emb: DataFrame,
    path: str,
    n_centroids: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize `emb` as an IVF index at `path`.

    Layout: ``path/vectors`` hive-partitioned by ``cell``;
    ``path/centroids`` the coarse centroids. n_centroids=None (the
    default) sizes the cell count from corpus stats with the √n rule
    (ivf_assignments) instead of a fixed constant.
    """
    centroids, assigned = ivf_assignments(emb, n_centroids, id_col, vec_col)
    (
        assigned.select(id_col, F.col("__vec").alias(vec_col), "cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(f"{path}/vectors")
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def topk_cosine_indexed(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors of `query_vec` from a materialized index.

    Cell selection happens on the driver against the centroid sidecar
    (tiny), so the vector scan carries a literal partition predicate —
    only the probed cells' files are listed, opened, or read.
    """
    cents = spark.read.parquet(f"{path}/centroids").collect()
    qnorm = math.sqrt(sum(x * x for x in query_vec)) or 1.0

    def cos(cvec: list[float]) -> float:
        cn = math.sqrt(sum(x * x for x in cvec)) or 1.0
        return sum(a * b for a, b in zip(query_vec, cvec)) / (cn * qnorm)

    probe = sorted(cents, key=lambda r: (-cos(r["cvec"]), r["cell"]))[:n_probe]
    cells = [r["cell"] for r in probe]

    vectors = spark.read.parquet(f"{path}/vectors").filter(
        F.col("cell").isin(cells)
    )
    scored = vectors.select(
        F.col(id_col),
        cosine_similarity_col(
            F.col(vec_col).cast("array<double>"),
            F.array(*[F.lit(float(x)) for x in query_vec]),
        ).alias("__cos"),
    )
    return _rank_topk(scored, id_col, k)


def append_to_ivf_index(
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Add a batch of new vectors to an existing IVF index — the
    ingest-time twin of `dedup_index.append_to_minhash_index`.

    The batch is assigned with the index's STORED centroids (the
    sidecar is authoritative — re-deriving centroids from the batch
    would scatter the same vector space across incompatible cells, the
    IVF analogue of probing a MinHash index with the wrong band
    parameters), then appended under the same `cell=` partitions.
    Historical vectors never move; per-batch cost is one narrow
    assignment pass + a partitioned append. Quantization drift — new
    data pulling the true cell structure away from the frozen
    centroids — is the operational trade every IVF deployment makes;
    rebuild when probe recall decays.

    Raises ValueError when the batch's vector dimensionality does not
    match the index's centroids (a mismatched append would silently
    land every vector in an arbitrary cell).
    """
    from ..operators.similarity import assign_cells

    spark = emb.sparkSession
    centroids = spark.read.parquet(f"{path}/centroids")
    first_cent = centroids.first()
    if first_cent is None:
        raise ValueError(f"index at {path} has an empty centroid sidecar")
    cdim = len(first_cent["cvec"])
    # validate EVERY row's dimensionality, not the first row's — a
    # mixed-dim batch would pass a first-row check and zip_with would
    # silently truncate the longer vectors into arbitrary cells
    bad_dims = [
        r["d"]
        for r in emb.select(F.size(F.col(vec_col)).alias("d")).distinct().collect()
        if r["d"] != cdim
    ]
    if bad_dims:
        raise ValueError(
            f"index at {path} holds {cdim}-dim centroids; refusing to "
            f"append vectors of dim(s) {sorted(bad_dims)}"
        )
    assigned = assign_cells(emb, centroids, id_col, vec_col)
    # append with the INDEX's on-disk element type: a batch that went
    # through arithmetic arrives as array<double>, and appending it
    # raw into an array<float> index leaves mixed parquet physical
    # types in one partition — reads then fail (or silently pick a
    # schema by file order)
    stored_type = spark.read.parquet(f"{path}/vectors").schema[vec_col].dataType
    (
        assigned.select(
            id_col, F.col("__vec").cast(stored_type).alias(vec_col), "cell"
        )
        .write.partitionBy("cell")
        .mode("append")
        .parquet(f"{path}/vectors")
    )

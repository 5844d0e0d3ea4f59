"""Round-4 training-pipeline operators: RFM segmentation, budget
selection, dedup reweighting, Matryoshka truncation, class weights.
Oracle parity runs in test_queries_oracle; these pin the semantics the
oracle can't see (closed-form ntile == SQL ntile on awkward sizes,
prefix-stop behavior, zero-vector rules, null labels)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    dedup,
    windows,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.embed import (
    truncate_embeddings,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
    budget_select,
    class_weights,
)


def _events(spark, n_users=10, per_user=3):
    rows = []
    eid = 0
    for u in range(n_users):
        for j in range(per_user):
            rows.append(
                (eid, f"2024-01-0{1 + u % 9} 0{j}:00:00", u, "click", float(u + j))
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_rfm_tile_sizes_match_ntile_contract(spark):
    """n=10 users, 4 tiles -> SQL ntile sizes are 3,3,2,2; the closed
    form must reproduce exactly that split for every metric."""
    out = windows.rfm_segments(_events(spark, n_users=10), n_tiles=4).collect()
    assert len(out) == 10
    for col in ("r_tile", "f_tile", "m_tile"):
        sizes = {}
        for r in out:
            sizes[r[col]] = sizes.get(r[col], 0) + 1
        assert sizes == {1: 3, 2: 3, 3: 2, 4: 2}, (col, sizes)
    for r in out:
        assert r["segment"] == f"{r['r_tile']}{r['f_tile']}{r['m_tile']}"


def test_rfm_fewer_users_than_tiles(spark):
    """n=2 users, 4 tiles -> ntile gives each row its own tile (1, 2)."""
    out = windows.rfm_segments(_events(spark, n_users=2), n_tiles=4).collect()
    assert sorted(r["r_tile"] for r in out) == [1, 2]


def test_rfm_best_user_is_tile_one(spark):
    """The user with the most events and highest spend lands in f=1, m=1."""
    rows = [(i, "2024-01-01 00:00:00", 0, "click", 100.0) for i in range(5)]
    rows += [(10 + u, "2024-01-02 00:00:00", u, "click", 1.0) for u in range(1, 4)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["user_id"]: r for r in windows.rfm_segments(ev).collect()}
    assert got[0]["f_tile"] == 1 and got[0]["m_tile"] == 1
    # user 0's last event is OLDER than everyone else's -> worst recency tile
    assert got[0]["r_tile"] == max(r["r_tile"] for r in got.values())


def test_budget_select_prefix_stops_at_first_overflow(spark):
    scored = spark.createDataFrame(
        [
            (1, 0.9, 40),
            (2, 0.8, 100),  # overflows a 60-token budget...
            (3, 0.7, 5),    # ...and blocks this smaller doc too (prefix!)
        ],
        "doc_id long, quality_score double, n_tokens long",
    )
    out = budget_select(scored, budget=60).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["cum_cost"] == 40


def test_budget_select_order_and_cumsum(spark):
    scored = spark.createDataFrame(
        [(i, 1.0 - i / 100.0, 10) for i in range(10)],
        "doc_id long, quality_score double, n_tokens long",
    )
    out = sorted(budget_select(scored, budget=35).collect(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in out] == [0, 1, 2]
    assert [r["cum_cost"] for r in out] == [10, 20, 30]


def test_budget_select_ties_break_to_lower_id(spark):
    scored = spark.createDataFrame(
        [(5, 0.5, 10), (1, 0.5, 10), (3, 0.5, 10)],
        "doc_id long, quality_score double, n_tokens long",
    )
    out = budget_select(scored, budget=20).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 3]


def test_exact_dedup_weights_counts(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (5, "  SAME   text "), (3, "other")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_copies"] for r in dedup.exact_dedup_weights(docs).collect()}
    # normalization folds case+whitespace: ids 1,2,5 collapse to min-id 1
    assert out == {1: 3, 3: 1}


def test_exact_dedup_weights_matches_exact_dedup_survivors(spark, docs_small=None):
    docs = spark.createDataFrame(
        [(i, f"doc {i % 4}") for i in range(12)], "doc_id long, text string"
    )
    survivors = {r["doc_id"] for r in dedup.exact_dedup(docs).collect()}
    weighted = dedup.exact_dedup_weights(docs).collect()
    assert {r["doc_id"] for r in weighted} == survivors
    assert sum(r["n_copies"] for r in weighted) == 12


def test_truncate_embeddings_renormalizes(spark):
    emb = spark.createDataFrame(
        [(0, [3.0, 4.0, 100.0, 100.0]), (1, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in truncate_embeddings(emb, dims=2).collect()}
    v0 = out[0]
    assert [round(x, 6) for x in v0["embedding_trunc"]] == [0.6, 0.8]
    assert v0["norm_trunc"] == 5.0
    assert math.isclose(v0["norm_full"], math.sqrt(9 + 16 + 20000), rel_tol=1e-9)
    assert math.isclose(v0["retained_frac"], 25 / 20025, abs_tol=1e-6)
    # zero vector: stays zero, no NaN
    v1 = out[1]
    assert v1["embedding_trunc"] == [0.0, 0.0]
    assert v1["retained_frac"] == 0.0


def test_class_weights_balanced_recipe(spark):
    df = spark.createDataFrame(
        [(i, "en" if i < 6 else ("de" if i < 9 else None)) for i in range(10)],
        "doc_id long, lang string",
    )
    out = {r["lang"]: r for r in class_weights(df, "lang").collect()}
    # 3 classes (null is a real class), n_total=10
    assert math.isclose(out["en"]["class_weight"], 10 / (3 * 6), abs_tol=1e-6)
    assert math.isclose(out["de"]["class_weight"], 10 / (3 * 3), abs_tol=1e-6)
    assert math.isclose(out[None]["class_weight"], 10 / (3 * 1), abs_tol=1e-6)
    assert out["en"]["n_rows"] == 6



def test_range_checksum_diff_flags_only_dirty_ranges(spark):
    """Plant one text change and one deletion in KNOWN ranges: exactly
    those ranges flag same=false, every untouched range passes, and an
    identical pair of versions is all-clean."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.corpus import (
        range_checksum_diff,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1000)], "doc_id long, text string"
    )
    clean = {r["rng"]: r for r in
             range_checksum_diff(docs, docs, "doc_id", "text", bucket=100).collect()}
    assert len(clean) == 10 and all(r["same"] for r in clean.values())

    v2 = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 250, F.lit("edited")).otherwise(F.col("text")),
    ).filter(F.col("doc_id") != 777)
    out = {r["rng"]: r for r in
           range_checksum_diff(docs, v2, "doc_id", "text", bucket=100).collect()}
    dirty = {rng for rng, r in out.items() if not r["same"]}
    assert dirty == {2, 7}
    assert out[7]["n_1"] == 100 and out[7]["n_2"] == 99  # the deletion
    assert out[2]["n_1"] == out[2]["n_2"] == 100         # content-only change


def test_neyman_allocation_matches_numpy_and_favors_noisy_strata(spark):
    import numpy as np

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
        neyman_allocation,
    )

    rng = np.random.default_rng(7)
    rows = []
    # stratum a: many rows, tiny variance; b: few rows, huge variance
    rows += [("a", float(v)) for v in rng.normal(100, 0.1, 900)]
    rows += [("b", float(v)) for v in rng.normal(100, 50.0, 100)]
    df = spark.createDataFrame(rows, "stratum string, value double")
    out = {r["stratum"]: r for r in
           neyman_allocation(df, "stratum", "value", budget=1000).collect()}

    vals = {k: np.array([v for s, v in rows if s == k]) for k in ("a", "b")}
    for k in ("a", "b"):
        sd = float(np.std(vals[k], ddof=1))
        assert out[k]["sigma_milli"] == int(sd * 1000) // 1, k
        assert abs(out[k]["sigma_milli"] - sd * 1000) <= 1
    # Neyman: b's noisy 10% of rows deserves most of the budget
    # (proportional allocation would give b only ~100)
    assert out["b"]["alloc"] > 800
    assert out["a"]["alloc"] + out["b"]["alloc"] <= 1000


def test_neyman_degenerate_strata_get_zero(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
        neyman_allocation,
    )

    df = spark.createDataFrame(
        [("const", 5.0), ("const", 5.0), ("single", 1.0),
         ("live", 1.0), ("live", 3.0)],
        "stratum string, value double",
    )
    out = {r["stratum"]: r for r in
           neyman_allocation(df, "stratum", "value", budget=100).collect()}
    assert out["const"]["sigma_milli"] == 0 and out["const"]["alloc"] == 0
    assert out["single"]["sigma_milli"] == 0 and out["single"]["alloc"] == 0
    assert out["live"]["alloc"] == 100  # the only informative stratum



def test_group_reservoir_sample_deterministic_k_per_group(spark):
    """Exactly min(k, group size) rows per group, stable across runs,
    rank contiguous from 1."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
        group_reservoir_sample,
    )

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(30)] + [(100, "tiny")],
        "id long, grp string",
    )
    out1 = group_reservoir_sample(df, "grp", "id", k=4).collect()
    out2 = group_reservoir_sample(df, "grp", "id", k=4).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_g = {}
    for r in out1:
        by_g.setdefault(r["grp"], []).append(r["sample_rank"])
    assert {g: sorted(v) for g, v in by_g.items()} == {
        "g0": [1, 2, 3, 4], "g1": [1, 2, 3, 4], "g2": [1, 2, 3, 4], "tiny": [1],
    }


def test_leakage_safe_split_keeps_near_dup_pairs_together(spark):
    """Every near-dup pair must land on the same side of the split —
    the property a doc-keyed split violates."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.dedup import (
        near_dup_clusters,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # 50 planted near-dup pairs (i, i+1000); rest singletons
    pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(50)], "id_a long, id_b long"
    )
    clusters = near_dup_clusters(pairs)
    out = leakage_safe_split(docs, clusters).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    assert len(split) == 200
    for i in range(50):
        assert split[i] == split[i + 100], f"pair ({i},{i+100}) straddles the split"
    assert {r["split"] for r in out} == {"train", "holdout"}


def test_unimax_water_filling_saturates_small_languages(spark):
    """caps [10,20,100] (max_epochs=1), budget 60: the two small
    languages saturate, the big one takes the remaining 30."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
        unimax_weights,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 10), "aa"), (2, " ".join(["w"] * 20), "bb"),
         (3, " ".join(["w"] * 100), "cc")],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r for r in unimax_weights(docs, 60, max_epochs=1).collect()}
    assert {l: out[l]["alloc"] for l in out} == {"aa": 10, "bb": 20, "cc": 30}
    assert out["aa"]["epochs_milli"] == 1000
    assert out["cc"]["epochs_milli"] == 300


def test_unimax_budget_over_capacity_gives_everything(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
        unimax_weights,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 10), "aa"), (2, " ".join(["w"] * 20), "bb")],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r["alloc"] for r in unimax_weights(docs, 10**6, max_epochs=2).collect()}
    assert out == {"aa": 20, "bb": 40}


def test_unimax_tight_budget_splits_uniformly(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.sampling import (
        unimax_weights,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 10), "aa"), (2, " ".join(["w"] * 20), "bb"),
         (3, " ".join(["w"] * 100), "cc")],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r["alloc"] for r in unimax_weights(docs, 15, max_epochs=1).collect()}
    assert out == {"aa": 5, "bb": 5, "cc": 5}

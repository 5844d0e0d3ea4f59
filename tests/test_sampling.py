

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

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.session import (
        get_spark,
    )

    s = get_spark(app_name="engine-tests", cpus="4", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        TABLES,
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()

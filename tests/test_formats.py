"""Format breadth: ORC round-trip with predicate pushdown, and parquet
schema evolution (mergeSchema) — operational capabilities a long-lived
100 TB corpus relies on (readers must survive columns added later)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_DIR


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    out = str(tmp_path / "orders_orc")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    orders.write.mode("overwrite").orc(out)

    back = spark.read.orc(out)
    assert back.count() == orders.count()
    assert back.schema == orders.schema

    probe = back.filter(F.col("o_custkey") == 7).select("o_orderkey", "o_custkey")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # ORC scans take the same pushdown/pruning path as parquet
    assert "PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7" in plan, plan
    assert probe.count() == orders.filter(F.col("o_custkey") == 7).count()


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    out = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "doc_id long, text string"
    ).write.mode("append").parquet(out)
    # a later writer adds a column — old files stay untouched
    spark.createDataFrame(
        [(2, "b", "en")], "doc_id long, text string, lang string"
    ).write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r["lang"] for r in merged.collect()}
    assert rows == {1: None, 2: "en"}  # old rows read the new column as null

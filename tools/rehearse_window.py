"""Rehearse the driver's 50-query correctness window at sf0.01.

Runs every window entry's Spark plan and DuckDB oracle on the same
parquet (the driver's scale factor, not pytest's sf0.001) and compares
them with the SAME canonicalization the parity suite uses
(tests/test_queries_oracle.py): type-FAMILY schema equivalence (int32
vs int64 and timestamp[ns] vs [us] are the same family; HUGEINT is
not), column-name-sorted, row-sorted, tight float tolerance.

Usage: python tools/rehearse_window.py [sf_dir] [name ...]
  (default sf_dir /root/testdata/sf0.01; default names = the first 50
  registry entries, i.e. the live window)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from tests.test_queries_oracle import (
        assert_oracle_dtypes_representable,
        canonical,
    )

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    names = sys.argv[2:] or list(qs)[:50]
    bad = []
    for i, name in enumerate(names):
        try:
            sdf = qs[name](spark, sf_dir)
            rel = con.sql(osql[name])
            assert_oracle_dtypes_representable(name, sdf, rel)
            s, o = sdf.toPandas(), rel.df()
            assert sorted(s.columns) == sorted(o.columns), "columns"
            assert len(s) == len(o), f"rows {len(s)} vs {len(o)}"
            pd.testing.assert_frame_equal(
                canonical(s), canonical(o),
                check_dtype=False, rtol=1e-9, atol=1e-9,
            )
            print(f"{i:2d} {name}: OK ({len(s)} rows)", flush=True)
        except Exception as ex:  # noqa: BLE001 - report and continue
            bad.append(name)
            print(f"{i:2d} {name}: FAIL {type(ex).__name__}: "
                  f"{str(ex)[:300]}", flush=True)
    print(f"\n{len(names) - len(bad)}/{len(names)} green; BAD: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

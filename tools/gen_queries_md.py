"""Regenerate QUERIES.md from the live registry.

Usage: python tools/gen_queries_md.py > QUERIES.md
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
)

DRIVER_WINDOW = 50

HEADER = """# QUERIES — driver-facing inventory (generated)

One row per `__spark_entry__.queries()` entry, in registry order — the
first 50 are all oracle-backed (inside the driver's checked prefix);
the rows-only tail is last by design. Check = `oracle`: DuckDB-SQL
twin compared row/schema/value-exact at sf0.01 by the driver;
`oracle (pytest)`: same exact DuckDB twin, but the entry sits past the
driver's 50-entry window so tests/test_queries_oracle.py runs the
comparison instead; `rows-only`: non-SQL-expressible (engine hashes,
iterative state, sketches) — quality pinned in tests/ instead.

| query | check | what it does |
|---|---|---|"""


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip().splitlines()
    return doc[0].strip() if doc else ""


def main() -> None:
    print(HEADER)
    for i, (name, fn) in enumerate(QUERIES.items()):
        if name not in ORACLE_SQL:
            check = "rows-only"
        elif i < DRIVER_WINDOW:
            check = "oracle"
        else:
            check = "oracle (pytest)"
        print(f"| `{name}` | {check} | {first_line(fn)} |")


if __name__ == "__main__":
    main()

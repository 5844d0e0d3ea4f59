"""Cross-session determinism audit: run every registry query in an
independent cold SparkSession (one subprocess per pass), hash each
result exactly the way the driver's value-hash gate does (columns
sorted by name, rows sorted, md5 of the CSV), and diff the two maps.

Usage: python tools/check_determinism.py [sf_dir]       (two passes)
       python tools/check_determinism.py --pass out.json [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_pass(sf_dir: str, out_path: str) -> None:
    from pyspark.sql import SparkSession

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans import (
        QUERIES,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    hashes: dict[str, str] = {}
    for name, fn in QUERIES.items():
        try:
            pdf = fn(spark, sf_dir).toPandas()
            pdf = pdf[sorted(pdf.columns)]
            for c in pdf.columns:
                if pdf[c].dtype == object:
                    pdf[c] = pdf[c].astype(str)
            pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
            csv = pdf.to_csv(index=False, float_format="%.9g")
            hashes[name] = hashlib.md5(csv.encode()).hexdigest()
        except Exception as ex:  # noqa: BLE001 — record, don't abort the audit
            hashes[name] = f"ERROR: {type(ex).__name__}: {ex}"[:200]
    with open(out_path, "w") as f:
        json.dump(hashes, f, indent=0, sort_keys=True)
    spark.stop()


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--pass":
        run_pass(args[2] if len(args) > 2 else "/root/testdata/sf0.01", args[1])
        return
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    outs = []
    for i in (1, 2):
        out = f"/tmp/determinism_pass{i}.json"
        subprocess.run(
            [sys.executable, __file__, "--pass", out, sf_dir], check=True
        )
        outs.append(json.load(open(out)))
    a, b = outs
    diff = sorted(k for k in a if a[k] != b.get(k))
    errs = sorted(k for k in a if str(a[k]).startswith("ERROR"))
    print(
        json.dumps(
            {
                "n_queries": len(a),
                "identical": len(a) - len(diff),
                "nondeterministic": diff,
                "errors": errs,
            }
        )
    )


if __name__ == "__main__":
    main()

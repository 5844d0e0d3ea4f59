"""Dump formatted physical plans for named queries into
plans/<round>/<query>_<tag>.txt — the before/after plan evidence for an
optimization round.

Usage:
    python tools/dump_round_plans.py r10 before q1 [q2 ...]
    python tools/dump_round_plans.py r10 after  q1 [q2 ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rnd, tag, *names = sys.argv[1:]
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans import (
        QUERIES,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="dump-round-plans", cpus="4")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", rnd)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # clip literal-heavy lines (md5 hyperplane constants) so the
        # plan SHAPE stays reviewable
        lines = [
            (ln[:400] + f" …[{len(ln) - 400} chars of literals clipped]")
            if len(ln) > 400
            else ln
            for ln in plan.rstrip().split("\n")
        ]
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

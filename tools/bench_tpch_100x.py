"""Second TPC-H decade (VERDICT r7 item 5): the 6 scan-heavy shapes
(q1, q4, q12, q13, q18, q21) at sf0.1 -> 10x -> 100x facts
(sf10-equivalent: 60M lineitem / 15M orders / 1.5M customer). The 10x
rung showed local fixed cost dominating; this is the decade where real
row-linear behavior and AQE join-strategy flips become visible. The
bar: each rung <= 3x its linear extrapolation from the previous one
(ratio <= 30 per decade), and any plan flip must be explained.

    python tools/gen_scale_ladder.py                                   # 10x
    python tools/gen_scale_ladder.py spark-warehouse/ladder_sf10 100 \
        lineitem,orders,customer,part
    cp /root/testdata/sf0.1/{supplier,nation,region}.parquet spark-warehouse/ladder_sf10/
    python tools/bench_tpch_100x.py [passes]

Results land in SCALE.md's "TPC-H second decade" table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNGS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("10x", os.path.join("spark-warehouse", "ladder_sf1")),
    ("100x", os.path.join("spark-warehouse", "ladder_sf10")),
]
SHAPES = ["tpch_q1", "tpch_q4", "tpch_q12", "tpch_q13", "tpch_q18", "tpch_q21"]


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for _, d in RUNGS:
        if not os.path.isfile(os.path.join(d, "lineitem.parquet")):
            raise SystemExit(f"{d}/lineitem.parquet missing — see module docstring")

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans import (
        QUERIES,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="bench_tpch_100x", cpus="32")
    spark.range(1000).count()

    results: dict[str, dict[str, float]] = {}
    for name in SHAPES:
        results[name] = {}
        for label, sf_dir in RUNGS:
            best = float("inf")
            for p in range(passes):
                t0 = time.monotonic()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.monotonic() - t0)
            results[name][label] = round(best, 2)
            print(f"# {name} @ {label}: {results[name][label]}s", file=sys.stderr)

    print(f"{'query':10} {'sf0.1':>8} {'10x':>8} {'100x':>8} {'r10':>6} {'r100':>6}  flag")
    flags = []
    for name in SHAPES:
        a, b, c = (results[name][l] for l, _ in RUNGS)
        r10 = b / a if a > 0 else float("inf")
        r100 = c / b if b > 0 else float("inf")
        flag = "OVER-3x-LINEAR" if r100 > 30 else ""
        if flag:
            flags.append(name)
        print(f"{name:10} {a:>8.2f} {b:>8.2f} {c:>8.2f} {r10:>5.1f}x {r100:>5.1f}x  {flag}")
    print(json.dumps({"results": results, "flagged": flags}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Clusters-path decades: wall clock AND star-contraction round count
for golden_record / entity_resolution at sf0.1 → 10× → 100× customer
(VERDICT r5 item 6: one more decade for the linkage graph).

The O(log² n) claim predicts round count grows by ≤ a couple of rounds
per decade (not 10×); wall should stay ≤ ~linear per decade since only
id pairs shuffle. Run AFTER generating the ladders:

    python tools/gen_scale_ladder.py                                    # 10x (all tables)
    python tools/gen_scale_ladder.py spark-warehouse/ladder_sf10 100 customer
    python tools/bench_clusters_decades.py [passes]

Results land in SCALE.md's "clusters-path decades" table.
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
QUERIES_UNDER_TEST = ["entity_resolution", "golden_record"]


def main() -> None:
    """argv: [passes] [rungs-csv]. The 100x rung needs a real heap —
    local[32] is the whole cluster, and 1.5M-name pair expansion in
    8 GB OOMs; run it with SPARK_GRAFT_DRIVER_MEM=32g (a 1000-executor
    cluster has ~3 orders of magnitude more aggregate memory)."""
    global RUNGS
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    if len(sys.argv) > 2:
        only = set(sys.argv[2].split(","))
        RUNGS = [(l, d) for l, d in RUNGS if l in only]
    for _, d in RUNGS:
        if not os.path.isfile(os.path.join(d, "customer.parquet")):
            raise SystemExit(f"{d}/customer.parquet missing — generate ladders first")

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
        dedup,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans import (
        QUERIES,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="bench_clusters_decades", cpus="32")
    spark.range(1000).count()

    results: dict[str, dict[str, dict]] = {}
    for name in QUERIES_UNDER_TEST:
        results[name] = {}
        for label, sf_dir in RUNGS:
            best, rounds = float("inf"), None
            for p in range(passes):
                t0 = time.monotonic()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.monotonic() - t0
                if dt < best:
                    best, rounds = dt, dedup.LAST_CLUSTER_ITERS
                print(
                    f"# {name} @ {label} pass {p}: {dt:.2f}s "
                    f"({dedup.LAST_CLUSTER_ITERS} rounds)",
                    file=sys.stderr,
                )
            results[name][label] = {"sec": round(best, 2), "rounds": rounds}

    print(f"{'query':20} {'rung':>6} {'sec':>9} {'rounds':>7} {'wall x/decade':>14}")
    for name, r in results.items():
        prev = None
        for label, _ in RUNGS:
            cell = r[label]
            ratio = f"{cell['sec'] / prev:.1f}x" if prev else "-"
            print(f"{name:20} {label:>6} {cell['sec']:>9.2f} {cell['rounds']:>7} {ratio:>14}")
            prev = cell["sec"]
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()

"""Events-family second decade (round 8): the TPC-H facts and the
documents corpus both have measured 100x rungs; this puts the
EVENTS-based statistics/experimentation family on the same footing —
sf0.1 -> 10x -> 100x generated events (10M rows at 100x, 100x distinct
users, preserved count/type/value/time-span distributions per
tools/gen_scale_ladder.py:gen_events).

Shapes chosen to cover the family's plan classes: one cumsum window
(sprt_ab_test), one tie-rank + pivot reduction (kruskal_wallis), one
ECDF cross-multiply (wasserstein_value_drift), one daily-grid
self-join (acf_daily), one per-(type,user) aggregate + rank
(activation_latency), one lag + rank window (event_freshness).

    python tools/gen_scale_ladder.py                                   # 10x
    python tools/gen_scale_ladder.py spark-warehouse/ladder_sf10 100 events
    python tools/bench_events_decades.py [passes]

Results land in SCALE.md's "events second decade" table.
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
SHAPES = [
    "sprt_ab_test",
    "kruskal_wallis",
    "wasserstein_value_drift",
    "acf_daily",
    "activation_latency",
    "event_freshness",
]


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for _, d in RUNGS:
        if not os.path.isfile(os.path.join(d, "events.parquet")):
            raise SystemExit(f"{d}/events.parquet missing — see module docstring")

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans import (
        QUERIES,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="bench_events_decades", cpus="32")
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

    print(f"{'query':26} {'sf0.1':>8} {'10x':>8} {'100x':>8} {'r10':>6} {'r100':>6}")
    for name in SHAPES:
        a, b, c = (results[name][l] for l, _ in RUNGS)
        print(
            f"{name:26} {a:>8.2f} {b:>8.2f} {c:>8.2f} "
            f"{b / a if a else 0:>5.1f}x {c / b if b else 0:>5.1f}x"
        )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()

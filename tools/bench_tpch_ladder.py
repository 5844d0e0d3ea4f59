"""TPC-H decade check (VERDICT r6 item 7): run the 22 TPC-H query
shapes at sf0.1 AND at the 10× generated corpus (sf1-equivalent fact
tables) and report the wall ratios — the cheap breadth check that the
plans hold a decade up (AQE join-strategy flips are the risk: a
broadcast side outgrowing the threshold can silently turn a
BroadcastHashJoin into a sort-merge exchange).

Data contract: tools/gen_scale_ladder.py generates 10× lineitem /
orders / customer / part with key spaces consistent with sf0.1's
supplier / nation / region (lineitem suppkeys are drawn from the REAL
sf0.1 supplier ids; nation/region are constant-size in TPC-H proper),
so those three dims are copied from sf0.1 into the ladder dir. The
bar: no query slower than 3× its linear extrapolation (ratio ≤ 30).

    python tools/gen_scale_ladder.py          # 10x facts
    cp /root/testdata/sf0.1/{supplier,nation,region}.parquet spark-warehouse/ladder_sf1/
    python tools/bench_tpch_ladder.py [passes]

Results land in SCALE.md's "TPC-H decade" table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join("spark-warehouse", "ladder_sf1")
TPCH = [f"tpch_q{i}" for i in range(1, 23)]


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for t in ("lineitem", "supplier", "nation", "region"):
        if not os.path.isfile(os.path.join(SF1, f"{t}.parquet")):
            raise SystemExit(f"{SF1}/{t}.parquet missing — see module docstring")

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans import (
        QUERIES,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="bench_tpch_ladder", cpus="32")
    spark.range(1000).count()

    results: dict[str, dict[str, float]] = {}
    for name in TPCH:
        results[name] = {}
        for label, sf_dir in (("sf0.1", SF01), ("10x", SF1)):
            best = float("inf")
            for p in range(passes):
                t0 = time.monotonic()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.monotonic() - t0)
            results[name][label] = round(best, 2)
            print(f"# {name} @ {label}: {results[name][label]}s", file=sys.stderr)

    print(f"{'query':10} {'sf0.1':>8} {'10x':>8} {'ratio':>7}  flag")
    flags = []
    for name in TPCH:
        a, b = results[name]["sf0.1"], results[name]["10x"]
        ratio = b / a if a > 0 else float("inf")
        flag = "OVER-3x-LINEAR" if ratio > 30 else ""
        if flag:
            flags.append(name)
        print(f"{name:10} {a:>8.2f} {b:>8.2f} {ratio:>6.1f}x  {flag}")
    print(json.dumps({"results": results, "flagged": flags}))
    spark.stop()


if __name__ == "__main__":
    main()

"""near_dup_threshold_sweep decades (VERDICT r7 item 8): the sweep
shares the capped LSH band-bucket candidate stage whose densification
the blocking-eval decades already measure — this harness puts the
sweep itself on the same sf0.1 → 10× → 100× documents rungs so its
6.4×@10× trajectory becomes a measured claim at 100×, with the same
honest fixture caveat (the generated corpora share the source's small
vocabulary, so bucket occupancy densifies faster than a real corpus
whose vocabulary grows with size; widen n_hashes/bands at scale).

    python tools/gen_scale_ladder.py                                        # 10x (all tables)
    python tools/gen_scale_ladder.py spark-warehouse/ladder_sf10 100 documents
    python tools/bench_sweep_decades.py [passes]

Results land in SCALE.md's "threshold-sweep decades" table.
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


def main() -> None:
    global RUNGS
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    if len(sys.argv) > 2:
        only = set(sys.argv[2].split(","))
        RUNGS = [(l, d) for l, d in RUNGS if l in only]
    for _, d in RUNGS:
        if not os.path.isfile(os.path.join(d, "documents.parquet")):
            raise SystemExit(f"{d}/documents.parquet missing — generate ladders first")

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
        dedup,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.session import (
        get_spark,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
        load_table,
    )

    spark = get_spark(app_name="bench_sweep_decades", cpus="32")
    spark.range(1000).count()

    results: dict[str, dict] = {}
    for label, sf_dir in RUNGS:
        best, rows = float("inf"), None
        for p in range(passes):
            t0 = time.monotonic()
            got = dedup.near_dup_threshold_sweep(
                load_table(spark, sf_dir, "documents")
            ).collect()
            dt = time.monotonic() - t0
            if dt < best:
                best, rows = dt, got
            print(f"# {label} pass {p}: {dt:.2f}s", file=sys.stderr)
        total_cand = sum(r["n_pairs"] for r in rows)
        top_band = max((r["band_milli"] for r in rows), default=0)
        results[label] = {
            "sec": round(best, 2),
            "n_bands": len(rows),
            "total_candidate_pairs": int(total_cand),
            "top_band_milli": int(top_band),
        }

    print(f"{'rung':>6} {'sec':>8} {'bands':>6} {'cand_pairs':>12} {'top_band':>9}")
    prev = None
    for label, _d in RUNGS:
        c = results[label]
        ratio = f" ({c['sec']/prev:.1f}x)" if prev else ""
        prev = c["sec"]
        print(
            f"{label:>6} {c['sec']:>8.2f} {c['n_bands']:>6} "
            f"{c['total_candidate_pairs']:>12} {c['top_band_milli']:>9}{ratio}"
        )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()

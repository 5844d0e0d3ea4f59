"""Blocking-eval decades: prove the sampled-truth estimator's core
scale claim (VERDICT r6 item 5) — the truth side's pair work stays
~CONSTANT across corpus decades while the candidate stage stays global.

The knob a growing corpus turns is the sample rate: the md5 doc-sample
fraction shrinks inversely with corpus size so the SAMPLED DOC COUNT
(and therefore the quadratic truth-side pair work) stays fixed, while
the banding/candidate stage and the reduction ratio remain global and
exact. This harness runs blocking_eval at sf0.1 → 10× → 100× documents
with milli rates 250 → 25 → 3 (~1.2–1.5k sampled docs at every rung)
and reports wall, sampled-doc count, truth pairs, and candidate pairs:
truth pairs should be ~flat; wall should track the LINEAR candidate
stage, not the quadratic truth.

    python tools/gen_scale_ladder.py                                      # 10x (all tables)
    python tools/gen_scale_ladder.py spark-warehouse/ladder_sf10 100 documents
    python tools/bench_blocking_decades.py [passes]

Results land in SCALE.md's "blocking-eval decades" table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNGS = [
    ("sf0.1", "/root/testdata/sf0.1", 250),
    ("10x", os.path.join("spark-warehouse", "ladder_sf1"), 25),
    ("100x", os.path.join("spark-warehouse", "ladder_sf10"), 3),
]


def main() -> None:
    global RUNGS
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    if len(sys.argv) > 2:
        only = set(sys.argv[2].split(","))
        RUNGS = [(l, d, m) for l, d, m in RUNGS if l in only]
    for _, d, _m in RUNGS:
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

    spark = get_spark(app_name="bench_blocking_decades", cpus="32")
    spark.range(1000).count()

    results: dict[str, dict] = {}
    for label, sf_dir, milli in RUNGS:
        best, row = float("inf"), None
        for p in range(passes):
            t0 = time.monotonic()
            got = dedup.minhash_blocking_eval(
                load_table(spark, sf_dir, "documents"), truth_sample_milli=milli
            ).collect()[0]
            dt = time.monotonic() - t0
            if dt < best:
                best, row = dt, got.asDict()
            print(f"# {label} (milli={milli}) pass {p}: {dt:.2f}s", file=sys.stderr)
        results[label] = {
            "sec": round(best, 2),
            "milli": milli,
            "n_docs": row["n_docs"],
            "n_docs_sampled": row["n_docs_sampled"],
            "n_true_pairs": row["n_true_pairs"],
            "n_candidate_pairs": row["n_candidate_pairs"],
            "pairs_completeness_milli": row["pairs_completeness_milli"],
            "reduction_ratio_milli": row["reduction_ratio_milli"],
        }

    hdr = (
        f"{'rung':>6} {'sec':>8} {'milli':>6} {'docs':>8} {'sampled':>8} "
        f"{'true_pairs':>11} {'cand_pairs':>11} {'PC':>5} {'RR':>5}"
    )
    print(hdr)
    for label, _d, _m in RUNGS:
        c = results[label]
        print(
            f"{label:>6} {c['sec']:>8.2f} {c['milli']:>6} {c['n_docs']:>8} "
            f"{c['n_docs_sampled']:>8} {c['n_true_pairs']:>11} "
            f"{c['n_candidate_pairs']:>11} {c['pairs_completeness_milli']:>5} "
            f"{c['reduction_ratio_milli']:>5}"
        )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()

"""Per-query profiler: wall time + Spark job/stage/task census for one
or more registry queries — the measurement step of the optimization
loop (spark_optimization_guide §1). At bench scale the data is tiny,
so wall time is dominated by plan shape: number of actions (jobs),
shuffle boundaries (stages) and task count. This tool makes those
visible without the UI (disabled in the sandbox).

Usage:
    python tools/profile_query.py q1 [q2 ...] [--passes N] [--sf DIR]
    python tools/profile_query.py --explain q1   # also dump formatted plan

Each query runs once cold then --passes warm passes (noop sink, same
methodology as bench.py); reported numbers are the best warm pass and
the job/stage/task counts of that pass (counted via the status tracker
inside a per-pass job group).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def census(spark, group: str) -> tuple[int, int, int]:
    """(jobs, stages, tasks) submitted under `group`."""
    tracker = spark.sparkContext.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is None:
                continue
            n_stages += 1
            n_tasks += sinfo.numTasks
    return len(job_ids), n_stages, n_tasks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    def _at_least_one(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("--passes must be >= 1")
        return n

    ap.add_argument("--passes", type=_at_least_one, default=3)
    ap.add_argument("--sf", default=SF_DIR)
    ap.add_argument("--explain", action="store_true")
    args = ap.parse_args()

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans import (
        QUERIES,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="profile", cpus=CPUS)
    spark.range(1000).count()
    QUERIES["per_file_count"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(0, 10_000, 1, int(CPUS)).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    for name in args.queries:
        fn = QUERIES[name]
        if args.explain:
            df = fn(spark, args.sf)
            print(f"==== {name} plan ====")
            df.explain("formatted")
        # cold
        t0 = time.monotonic()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        cold = time.monotonic() - t0
        best = None
        best_census = None
        for p in range(args.passes):
            group = f"{name}-pass{p}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.monotonic()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
            c = census(spark, group)
            if best is None or wall < best:
                best, best_census = wall, c
        jobs, stages, tasks = best_census
        print(
            f"{name}: cold={cold:.2f}s best={best:.2f}s "
            f"jobs={jobs} stages={stages} tasks={tasks}"
        )

    spark.stop()


if __name__ == "__main__":
    main()

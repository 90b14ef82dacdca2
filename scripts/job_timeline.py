"""Per-job timeline for one query run (round-12 measurement, guide §1).

Runs one warmup + one timed noop-sink execution of each named query and
prints every Spark job the run submitted with its wall time, task count
and description — the breakdown that tells WHERE a multi-job lifecycle
query (ingest loops, convergence folds, streaming replays) spends its
seconds, which `scripts/profile_queries.py`'s aggregate counters cannot.

Usage: python scripts/job_timeline.py name [name ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from insight_de_smart_grid_spark.session import get_spark  # noqa: E402
from insight_de_smart_grid_spark.plans.registry import QUERIES  # noqa: E402
from bench import run_query  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="job_timeline")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in names:
        if name not in QUERIES:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        if not name.startswith("streaming_"):
            run_query(spark, name, sf_dir)  # warmup
        group = f"tl-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        run_query(spark, name, sf_dir)
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        jobs = sorted(tracker.getJobIdsForGroup(group))
        print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs ===")
        # job timing via the low-level AppStatusStore (same source as the
        # UI): submission/completion give the per-job wall
        store = sc._jsc.sc().statusStore()
        total = 0.0
        for j in jobs:
            try:
                jd = store.job(j)
                sub = jd.submissionTime()
                com = jd.completionTime()
                dur = 0.0
                if sub.isDefined() and com.isDefined():
                    dur = (com.get().getTime()
                           - sub.get().getTime()) / 1000.0
                total += dur
                ntask = jd.numCompletedTasks()
                desc = (jd.name() or "")[:90]
                print(f"  job {j:5d}  {dur:7.3f}s  tasks={ntask:5d}  {desc}")
            except Exception as exc:
                print(f"  job {j}: ? ({exc})")
        print(f"  sum of job walls: {total:.2f}s "
              f"(gaps/driver = {wall - total:.2f}s)")


if __name__ == "__main__":
    main()

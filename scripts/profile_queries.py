"""Per-query profiling for the optimization rounds (guide §1).

For each named query (default: the N slowest from the latest BENCH_FULL):
one warmup + one timed noop-sink run inside a job group, reporting wall
seconds, Spark job count, task count, and total executor-task time — the
numbers that distinguish "real compute" from "scheduling overhead from too
many tiny jobs/stages" at sf0.1. Optionally dumps .explain("formatted")
for each query to a directory (--plans DIR).

Usage:
  python scripts/profile_queries.py [--plans DIR] [--top N] [name...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import os  # noqa: E402

from insight_de_smart_grid_spark.session import get_spark  # noqa: E402
from insight_de_smart_grid_spark.plans.registry import QUERIES  # noqa: E402
from bench import run_query  # noqa: E402


def job_stats(sc, group: str) -> dict:
    tracker = sc.statusTracker()
    jobs = tracker.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    for j in jobs:
        ji = tracker.getJobInfo(j)
        if ji is None:
            continue
        for s in ji.stageIds:
            si = tracker.getStageInfo(s)
            if si is not None and si.numCompletedTasks > 0:
                n_stages += 1
                n_tasks += si.numTasks
    return {"jobs": len(jobs), "stages": n_stages, "tasks": n_tasks}


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_dir = None
    top = 0
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_dir = args[i + 1]
            i += 2
        elif args[i] == "--top":
            top = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if top and not names:
        bench = json.loads(
            Path(REPO, "BENCH_FULL_r11.json").read_text())["queries"]
        names = [k for k, _ in sorted(bench.items(),
                                      key=lambda kv: -kv[1])[:top]]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out = {}
    for name in names:
        if name not in QUERIES:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        if plans_dir:
            try:
                Path(plans_dir).mkdir(parents=True, exist_ok=True)
                plan = QUERIES[name].fn(spark, sf_dir)._jdf.queryExecution() \
                    .explainString(
                        sc._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted"))
                Path(plans_dir, f"{name}.txt").write_text(plan)
            except Exception as exc:
                print(f"{name}: explain failed: {exc}", file=sys.stderr)
        try:
            if not name.startswith("streaming_"):
                run_query(spark, name, sf_dir)  # warmup
            group = f"prof-{name}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            run_query(spark, name, sf_dir)
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            stats = job_stats(sc, group)
            stats["wall"] = round(wall, 3)
            out[name] = stats
            print(f"{name:45s} {wall:7.2f}s  jobs={stats['jobs']:4d} "
                  f"stages={stats['stages']:4d} tasks={stats['tasks']:6d}",
                  flush=True)
        except Exception as exc:
            print(f"{name}: FAILED {exc}", file=sys.stderr)
    print("PROFILE " + json.dumps(out))


if __name__ == "__main__":
    main()

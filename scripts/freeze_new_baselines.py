"""Append frozen medians for newly-registered queries to BENCH_BASELINE.json.

Same method as the round-5 freeze (median of 3 warm runs at sf0.1 on
local[32]; streaming replays once — each run is a full cold stateful
replay already), applied only to queries present in the registry but
absent from the baseline. Updates `total` to the sum of the resulting
per-query medians (round-8 advisory contract) and extends the note.

Usage: python scripts/freeze_new_baselines.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from insight_de_smart_grid_spark.session import get_spark

    spark = get_spark(app_name="freeze_baselines")
    # the same steady-state warmup bench.py runs: JVM/codegen spin-up plus
    # one untimed run of each query about to be frozen
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    run(spark, sf_dir)


def run(spark, sf_dir: str = "/root/testdata/sf0.1") -> dict:
    """Measure + append from an existing session (callable from a REPL or
    a driver script that already built the bench-configured session)."""
    from insight_de_smart_grid_spark.plans.registry import QUERIES

    base_path = Path(REPO) / "BENCH_BASELINE.json"
    doc = json.loads(base_path.read_text())
    new = [n for n in sorted(QUERIES) if n not in doc["queries"]]
    for name in new:
        from bench import run_query

        if not name.startswith("streaming_"):
            run_query(spark, name, sf_dir)  # untimed warmup
        runs = []
        for _ in range(1 if name.startswith("streaming_") else 3):
            t0 = time.perf_counter()
            run_query(spark, name, sf_dir)
            runs.append(time.perf_counter() - t0)
        doc["queries"][name] = round(sorted(runs)[len(runs) // 2], 3)
        print(f"frozen {name}: {doc['queries'][name]}s", file=sys.stderr)
    doc["total"] = round(sum(doc["queries"].values()), 3)
    if new:
        doc["note"] += (f"; round-8 queries appended ({', '.join(new)} — "
                        "median of 3 warm runs / 1 for streaming, "
                        "same method)")
    base_path.write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
    return {n: doc["queries"][n] for n in new}


if __name__ == "__main__":
    main()

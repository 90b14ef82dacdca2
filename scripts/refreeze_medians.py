"""Re-freeze a specific list of drift-contaminated medians.

Round-9 froze five medians inside a heavy host-drift window (SCALE.md
round-9 drift note: the untouched spot-check `duty_cycle_10m` read 2.39x
its frozen median at freeze time), leaving those gates ~1.5-2x lenient.
This script re-measures exactly those queries on a quiet host and
overwrites their BENCH_BASELINE.json entries (same method as
freeze_new_baselines.py: median of 3 warm runs, 1 for streaming —
each streaming run is already a full cold stateful replay).

Gate: the spot-check query must read <= SPOT_MAX_RATIO x its own frozen
median in the same window, or the script refuses to freeze (the round-9
mistake was freezing without checking this).

Usage: python scripts/refreeze_medians.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DEFAULT_TARGETS = [
    "sim_ann_index_batch_probe",
    "streaming_range_join_bucketed",
    "sim_ann_index_ingest_loop",
    "streaming_ann_index_ingest",
    "sim_ivf_index_maintained",
]
SPOT_QUERY = "duty_cycle_10m"
SPOT_MAX_RATIO = 1.15


def measure(spark, name: str, sf_dir: str, warmups: int = 1) -> float:
    from bench import run_query

    if not name.startswith("streaming_"):
        for _ in range(warmups):
            run_query(spark, name, sf_dir)  # untimed warmup
    runs = []
    for _ in range(1 if name.startswith("streaming_") else 3):
        t0 = time.perf_counter()
        run_query(spark, name, sf_dir)
        runs.append(time.perf_counter() - t0)
    return sorted(runs)[len(runs) // 2]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    targets = sys.argv[2:] or DEFAULT_TARGETS
    from insight_de_smart_grid_spark.session import get_spark

    spark = get_spark(app_name="refreeze_medians")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base_path = Path(REPO) / "BENCH_BASELINE.json"
    doc = json.loads(base_path.read_text())

    # the frozen medians were measured deep inside a fully-warm bench
    # session; a sub-second query needs ~6 executions for codegen/JIT to
    # reach that state (measured round 10: 2.79 -> 0.49 s over 7 runs),
    # so warm the spot query hard before trusting its ratio
    spot = measure(spark, SPOT_QUERY, sf_dir, warmups=6)
    spot_ratio = spot / doc["queries"][SPOT_QUERY]
    print(f"spot-check {SPOT_QUERY}: {spot:.3f}s = "
          f"{spot_ratio:.2f}x frozen median", file=sys.stderr)
    if spot_ratio > SPOT_MAX_RATIO:
        print(f"host not quiet (> {SPOT_MAX_RATIO}x); refusing to freeze",
              file=sys.stderr)
        sys.exit(1)

    old = {}
    for name in targets:
        old[name] = doc["queries"].get(name)
        doc["queries"][name] = round(measure(spark, name, sf_dir), 3)
        print(f"re-frozen {name}: {old[name]} -> {doc['queries'][name]}s",
              file=sys.stderr)
    doc["total"] = round(sum(doc["queries"].values()), 3)
    doc["note"] += (f"; round-10 re-freeze of {len(targets)} "
                    "drift-contaminated round-9 medians "
                    f"({', '.join(targets)}) on a quiet host — spot-check "
                    f"{SPOT_QUERY} {spot_ratio:.2f}x its frozen median")
    base_path.write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
    print(json.dumps({"spot_ratio": round(spot_ratio, 3),
                      "old": old,
                      "new": {n: doc["queries"][n] for n in targets}}))


if __name__ == "__main__":
    main()

"""Bench harness: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Timing includes full execution + collect of each query's (small) result.
A warmup query amortizes JVM/codegen startup out of the numbers, matching
how a long-lived cluster actually behaves.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kstreamjs_spark.queries import all_queries  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    spark = get_spark("kstreamjs-bench", cpus=cpus)
    specs = {n: s for n, s in all_queries().items() if s.bench}

    # Warm every query once (codegen compile + file-index caches), then
    # time the steady-state run — matching how a long-lived cluster behaves,
    # where plans are compiled once and run thousands of times. Cold-start
    # numbers would measure the JIT, not the engine.
    for name, spec in sorted(specs.items()):
        spec.fn(spark, sf_dir).collect()

    # min of N timed runs per query: GC pauses and thread contention on a
    # shared 32-thread JVM add ±0.5s jitter that min() filters out. The
    # r5/r6 rounds both needed prose to explain host-load drift in the
    # driver sweep; min-of-N plus the observed load average makes the
    # number self-evident. N is recorded in the JSON.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    load_before = round(os.getloadavg()[0], 2)
    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    load_after = round(os.getloadavg()[0], 2)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "runs_per_query": runs,
                "loadavg_1m_before": load_before,
                "loadavg_1m_after": load_after,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""One-protocol baseline re-measurement (round-8 verdict item #2).

BASELINE.md's oracle columns accumulated across rounds 1/5/6 under
varying host conditions, while engine numbers are fresh min-of-N — so
floor-vs-compute adjudications (q104b especially) compared numbers that
never shared a host. This script measures BOTH sides of every headline
row under the identical protocol, in one process, on one host, back to
back:

- DuckDB oracle: 32 threads, warm view setup, min of N timed runs of
  the exact oracle SQL each query registers (q26b, rows-only by design,
  uses its exact-verify counterpart q26d's SQL — the honest exact
  baseline for what it approximates).
- Engine: warm (plans compiled + caches populated by a full warmup
  pass), min of N timed runs — bench.py's exact discipline.
- q104b additionally gets an ISOLATED engine measurement (fresh timing
  after the sweep, no interleaved queries) so the three-round-old
  isolated-vs-in-sweep ambiguity is adjudicated by one artifact.

Output: one JSON line with per-query {engine, oracle} seconds plus the
protocol stamp (runs, threads, load-avg) — pasted into BASELINE.md as
the single same-host table.

Usage: python scripts/oracle_bench.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from kstreamjs_spark.queries import all_queries  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402
from kstreamjs_spark.testing import duck_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    qs = all_queries()
    bench = {n: s for n, s in qs.items() if s.bench}
    # q26b is rows-only; its comparison column has always been the
    # DuckDB run of the exact-verified near-dup SQL it approximates.
    oracle_sql = {
        n: (s.oracle if s.oracle else qs["q26d_minhash_verify"].oracle)
        for n, s in bench.items()
    }

    load0 = round(os.getloadavg()[0], 2)

    # ---- DuckDB side: same warm+min-of-N discipline as bench.py ----
    con = duck_connection(sf_dir)
    con.execute("SET threads TO 32")
    duck: dict[str, float] = {}
    for name in sorted(bench):
        sql = oracle_sql[name]
        con.execute(sql).fetchall()  # warm (buffer pool + plan)
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck[name] = round(best, 3)

    # ---- engine side: bench.py's exact protocol, same process ----
    spark = get_spark("oracle-bench", cpus=32)
    for name in sorted(bench):
        bench[name].fn(spark, sf_dir).collect()  # warmup pass
    engine: dict[str, float] = {}
    for name in sorted(bench):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            bench[name].fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        engine[name] = round(best, 3)

    # ---- q104b isolated: after the sweep, nothing interleaved ----
    time.sleep(1)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        bench["q104b_fuzzy_blocked_pairs"].fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    q104b_isolated = round(best, 3)

    load1 = round(os.getloadavg()[0], 2)
    print(json.dumps({
        "metric": "same_host_engine_vs_oracle",
        "sf_dir": sf_dir,
        "runs_per_query": runs,
        "duckdb_threads": 32,
        "loadavg_1m_before": load0,
        "loadavg_1m_after": load1,
        "queries": {
            n: {"engine_s": engine[n], "oracle_s": duck[n]}
            for n in sorted(bench)
        },
        "engine_total_s": round(sum(engine.values()), 3),
        "oracle_total_s": round(sum(duck.values()), 3),
        "q104b_isolated_s": q104b_isolated,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Century sweep for cluster.pagerank: seeded synthetic symmetric graph
at 1x/10x/100x of 2,000 nodes (12 edges/node), wall + event-log
task-seconds per run.

Measures the operator's two claims at scale: the per-iteration exchange
is O(nodes) (map-side partial agg collapses per-edge contributions), and
the edge materialization is paid ONCE, so total task-seconds track
edges + iters*nodes — linear, with the fixed 2-stage-per-iteration
scheduling constant amortizing as the graph grows.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts \
           python scripts/profile_q176_century.py [mult ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from kstreamjs_spark.operators.cluster import pagerank  # noqa: E402
from profile_q26_century import build_session, stage_report  # noqa: E402
from profile_q175_century import _clear_evdir  # noqa: E402


def graph(spark, mult: int, base_nodes: int = 2000, deg: int = 12):
    """Seeded deterministic multigraph: for each of deg*N directed stubs,
    endpoints from integer hashes; symmetrized so out-degree >= 1 holds
    for every appearing node (the operator's contract)."""
    n = base_nodes * mult
    e = spark.range(n * deg).select(
        (F.pmod(F.hash(F.col("id") * 2654435761), n)).alias("src"),
        (F.pmod(F.hash(F.col("id") * 40503 + 7), n)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def main() -> int:
    mults = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [
        1, 10, 100,
    ]
    evdir = "/tmp/spark-events-q26"
    results = []
    for mult in mults:
        _clear_evdir(evdir)
        spark = build_session(False)
        g = graph(spark, mult)
        t0 = time.perf_counter()
        out = pagerank(g, iters=8)
        n = out.count()
        wall = time.perf_counter() - t0
        spark.stop()
        time.sleep(2)
        report = []
        for entry in os.listdir(evdir):
            report.extend(stage_report(os.path.join(evdir, entry)))
        task_s = sum(s.get("task_s") or 0.0 for s in report)
        results.append((mult, n, wall, task_s))
        print(
            f"=== mult={mult}: {n} nodes ranked, wall {wall:.1f}s, "
            f"task-seconds {task_s:.1f} ===",
            flush=True,
        )
    print(json.dumps([
        {"mult": m, "nodes": n, "wall_s": round(w, 1),
         "task_s": round(t, 1)} for m, n, w, t in results
    ]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

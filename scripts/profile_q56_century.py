"""Century-scale profile of q56's iterative connected components (round-8
verdict #7) — the one heavy operator family whose scale evidence was
decade-only.

Protocol = the q26 century protocol: generator-backed corpus at 1x/10x/
100x (docgen, block-prefixed vocab so near-dup pairs stay within blocks
and pair counts scale with the corpus, not quadratically across it),
Spark event log enabled, and the claim made on per-phase EXECUTOR
TASK-SECONDS (host-load-independent), not wall clock (measured +-40% on
this box for identical plans — SCALE.md round 7).

Phases are attributed via job groups: pair generation (the q26 shingle
join, already profiled to p=0.86 — re-measured here because the CC edge
list materializes it) and CC proper (symmetrize + N propagate rounds),
each tagged with sc.setJobGroup and aggregated from the event log's
JobStart -> stage ids -> TaskEnd metrics chain. Per-round convergence
counts come from connected_components(round_stats=...).

Usage: python scripts/profile_q56_century.py [mult ...]   (default 1 10 100)
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from profile_q26_century import _event_lines, build_session, corpus  # noqa: E402

from kstreamjs_spark.operators import cluster, dedup  # noqa: E402

EVDIR = "/tmp/spark-events-q26"  # build_session's fixed event-log dir


def group_task_seconds(evlog: str) -> dict[str, dict]:
    """job group -> {task_s, sh_write_mb, spill_mb} via JobStart (stage
    ids + spark.jobGroup.id property) joined to TaskEnd metrics."""
    stage_group: dict[int, str] = {}
    out: dict[str, dict] = {}
    for line in _event_lines(evlog):
        try:
            ev = json.loads(line)
        except ValueError:
            continue
        if ev.get("Event") == "SparkListenerJobStart":
            grp = (ev.get("Properties") or {}).get("spark.jobGroup.id", "")
            for sid in ev.get("Stage IDs", []):
                stage_group.setdefault(sid, grp)
        elif ev.get("Event") == "SparkListenerTaskEnd":
            grp = stage_group.get(ev.get("Stage ID"), "")
            m = ev.get("Task Metrics") or {}
            if not m:
                continue
            g = out.setdefault(
                grp, {"task_s": 0.0, "sh_write_mb": 0.0, "spill_mb": 0.0}
            )
            g["task_s"] += m.get("Executor Run Time", 0) / 1000
            swm = m.get("Shuffle Write Metrics") or {}
            g["sh_write_mb"] += swm.get("Shuffle Bytes Written", 0) / 2**20
            g["spill_mb"] += m.get("Disk Bytes Spilled", 0) / 2**20
    return out


def main() -> int:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = build_session(tmpfs=False)
    sc = spark.sparkContext
    app_id = sc.applicationId
    results = []
    for mult in mults:
        d = corpus(spark, mult)
        sc.setJobGroup(f"pairs_m{mult}", f"pair generation x{mult}")
        t0 = time.perf_counter()
        edges = (
            dedup.jaccard_pairs(d, threshold=0.5, partition_col=None)
            .localCheckpoint(eager=True)
        )
        n_pairs = edges.count()
        t_pairs = time.perf_counter() - t0

        sc.setJobGroup(f"cc_m{mult}", f"connected components x{mult}")
        rounds: list = []
        t0 = time.perf_counter()
        comps = cluster.connected_components(
            edges, src="d1", dst="d2", round_stats=rounds
        )
        n_nodes = comps.count()
        n_comps = comps.select("label").distinct().count()
        t_cc = time.perf_counter() - t0
        sc.setJobGroup("idle", "idle")
        edges.unpersist()
        results.append({
            "mult": mult, "pairs": n_pairs, "nodes": n_nodes,
            "components": n_comps, "wall_pairs_s": round(t_pairs, 1),
            "wall_cc_s": round(t_cc, 1), "rounds": rounds,
        })
        print(json.dumps(results[-1]), flush=True)
    spark.stop()
    time.sleep(2)

    logs = set(glob.glob(f"{EVDIR}/*{app_id}*") + glob.glob(f"{EVDIR}/{app_id}"))
    groups: dict[str, dict] = {}
    for lg in logs:
        for grp, g in group_task_seconds(lg).items():
            acc = groups.setdefault(grp, {"task_s": 0.0, "sh_write_mb": 0.0,
                                          "spill_mb": 0.0})
            for k in acc:
                acc[k] += g[k]
    for r in results:
        for phase in ("pairs", "cc"):
            g = groups.get(f"{phase}_m{r['mult']}", {})
            r[f"task_s_{phase}"] = round(g.get("task_s", 0.0), 1)
            r[f"sh_write_mb_{phase}"] = round(g.get("sh_write_mb", 0.0), 1)
            r[f"spill_mb_{phase}"] = round(g.get("spill_mb", 0.0), 1)

    def fit(xk, yk):
        pts = [(r["mult"], r[yk]) for r in results if r.get(yk)]
        if len(pts) < 2:
            return None
        (x1, y1), (x2, y2) = pts[0], pts[-1]
        return round(math.log(y2 / y1) / math.log(x2 / x1), 2)

    summary = {
        "metric": "q56_cc_century",
        "points": results,
        "exponents": {
            "task_s_pairs": fit("mult", "task_s_pairs"),
            "task_s_cc": fit("mult", "task_s_cc"),
            "pairs": fit("mult", "pairs"),
        },
    }
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

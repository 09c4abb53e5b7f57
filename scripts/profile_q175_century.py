"""Century sweep for q175 (substring_dup_spans): generator-backed corpus
at 1x/10x/100x of 5,000 docs, wall + per-run event-log task-seconds.

The op's bill is O(total_tokens) fixed-width shuffle rows (window
fingerprints) plus two content exchanges; this script measures whether
the wall and task-seconds track that linear bill or hide a super-linear
term (hot boilerplate fingerprints widening the multiplicity window).

Usage: python scripts/profile_q175_century.py [mult ...]   (default 1 10 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from kstreamjs_spark.operators import dedup  # noqa: E402
from profile_q26_century import build_session, stage_report  # noqa: E402


def corpus(spark, mult: int, base_rows: int = 5000):
    from kstreamjs_spark.sources import docgen as _dg

    _dg.register(spark)
    total = base_rows * mult
    return (
        spark.read.format("docgen")
        .option("partitions", 32)
        .option("rows_per_partition", max(1, total // 32))
        .option("seed", 11)
        .load()
    )


def _clear_evdir(evdir: str) -> None:
    import shutil

    if not os.path.isdir(evdir):
        os.makedirs(evdir, exist_ok=True)
        return
    for f in os.listdir(evdir):
        p = os.path.join(evdir, f)
        if os.path.isfile(p):
            os.remove(p)
        else:
            shutil.rmtree(p)


def main() -> int:
    mults = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [
        1, 10, 100,
    ]
    results = []
    for mult in mults:
        # build_session pins its event dir; clear it BEFORE each run so
        # stale logs (a prior q26 profile, an aborted sweep) never leak
        # into this run's task-second sums
        _clear_evdir("/tmp/spark-events-q26")
        spark = build_session(False)
        d = corpus(spark, mult)
        t0 = time.perf_counter()
        n = dedup.substring_dup_spans(
            d.select("doc_id", "lang", "text")
        ).count()
        wall = time.perf_counter() - t0
        spark.stop()
        time.sleep(2)
        # the event dir holds one app-id-named file (non-rolling default)
        # or an eventlog_v2_* subdir per app — feed each to stage_report
        evdir = "/tmp/spark-events-q26"
        report = []
        for entry in os.listdir(evdir):
            report.extend(stage_report(os.path.join(evdir, entry)))
        task_s = sum(s.get("task_s") or 0.0 for s in report)
        # the docgen Python-source scan is generation cost, not the op's;
        # report it separately so the op exponent is readable (matched by
        # stage NAME — AQE renumbers stages between mults)
        gen_s = sum(
            s.get("task_s") or 0.0
            for s in report
            if "BatchEvalPython" in (s.get("name") or "")
            or "PlanDataSource" in (s.get("name") or "")
            or "ArrowEvalPython" in (s.get("name") or "")
            or "MapInArrow" in (s.get("name") or "")
        )
        results.append((mult, n, wall, task_s, gen_s))
        print(
            f"=== mult={mult}: {n} affected docs, wall {wall:.1f}s, "
            f"task-seconds {task_s:.1f} (docgen scan {gen_s:.1f}) ===",
            flush=True,
        )
        for s in sorted(report, key=lambda s: -(s.get("task_s") or 0))[:6]:
            print("  ", json.dumps(s), flush=True)
    print(json.dumps([
        {"mult": m, "docs_affected": n, "wall_s": round(w, 1),
         "task_s": round(t, 1), "docgen_task_s": round(g, 1)}
        for m, n, w, t, g in results
    ]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Decade sweep for the q203 Gopher repetition shape: the documents
corpus multiplied 1x/10x (disjoint token prefixes — the honest "10x
more data" regime), wall + event-log task-seconds per run.

Measures the claim in q203's docstring: the cost is the 9x-token gram
exchange (fixed-width rows, map-side combined), so task-seconds track
tokens linearly — no per-doc or per-n super-linear term.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts \
           python scripts/profile_q203_decade.py [sf_dir] [mult ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from profile_q26_century import build_session, stage_report  # noqa: E402
from profile_q175_century import _clear_evdir  # noqa: E402
from stress import multiply  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.1"
    mults = [int(a) for a in args[1:]] or [1, 10]
    evdir = "/tmp/spark-events-q26"
    results = []
    for mult in mults:
        _clear_evdir(evdir)
        spark = build_session(False)
        from kstreamjs_spark.queries import all_queries

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        big = multiply(docs, "doc_id", mult, disjoint_text="text")
        big.createOrReplaceTempView("__q203_docs")

        # run the query body against the multiplied frame via the same
        # monkeypatch idiom the gini pytest uses
        import kstreamjs_spark.queries.llm as llm
        from unittest import mock

        spec = all_queries()["q203_gopher_repetition"]
        t0 = time.perf_counter()
        with mock.patch.object(
            llm, "load", lambda _s, _sf, *_t: (spark.table("__q203_docs"),)
        ):
            n = spec.fn(spark, "ignored").count()
        wall = time.perf_counter() - t0
        spark.stop()
        time.sleep(2)
        report = []
        for entry in os.listdir(evdir):
            report.extend(stage_report(os.path.join(evdir, entry)))
        task_s = sum(s.get("task_s") or 0.0 for s in report)
        results.append((mult, n, wall, task_s))
        print(
            f"=== mult={mult}: {n} lang rows, wall {wall:.1f}s, "
            f"task-seconds {task_s:.1f} ===",
            flush=True,
        )
    print(json.dumps([
        {"mult": m, "rows": n, "wall_s": round(w, 1),
         "task_s": round(t, 1)} for m, n, w, t in results
    ]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

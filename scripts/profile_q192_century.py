"""Century sweep for sketch.kmv_distinct (q192): distinct-count of a
seeded synthetic key column at 1x/10x/100x of 2,000,000 rows (~1/8
distinct), KMV (k=1024) vs exact countDistinct, wall + event-log
task-seconds.

The claims: the KMV exchange is <= k longs per partition — constant in
N — so total cost is the scan plus a vectorized per-partition fold,
while exact countDistinct shuffles the full distinct key set; and the
estimate stays inside the ~3.1% standard error at every N.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts \
           python scripts/profile_q192_century.py [mult ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from kstreamjs_spark.operators.sketch import kmv_distinct  # noqa: E402
from profile_q26_century import build_session, stage_report  # noqa: E402
from profile_q175_century import _clear_evdir  # noqa: E402


def main() -> int:
    mults = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [
        1, 10, 100,
    ]
    evdir = "/tmp/spark-events-q26"
    results = []
    for mult in mults:
        n = 2_000_000 * mult
        row = {"mult": mult, "rows": n}

        def keys(spark):
            return spark.range(n).select(
                F.pmod(F.xxhash64("id"), F.lit(n // 8)).alias("v")
            )

        for mode in ("kmv", "exact"):
            _clear_evdir(evdir)
            spark = build_session(False)
            t0 = time.perf_counter()
            if mode == "kmv":
                est, _ = kmv_distinct(keys(spark), "v", k=1024)
                row["kmv_est"] = est
            else:
                row["exact"] = keys(spark).agg(
                    F.countDistinct("v")
                ).collect()[0][0]
            row[f"{mode}_wall_s"] = round(time.perf_counter() - t0, 1)
            spark.stop()
            time.sleep(2)
            report = []
            for entry in os.listdir(evdir):
                report.extend(stage_report(os.path.join(evdir, entry)))
            row[f"{mode}_task_s"] = round(
                sum(s.get("task_s") or 0.0 for s in report), 1
            )
        row["rel_err"] = round(
            abs(row["kmv_est"] - row["exact"]) / row["exact"], 4
        )
        results.append(row)
        print(f"=== {json.dumps(row)} ===", flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

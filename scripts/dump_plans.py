"""Dump .explain("formatted") for bench queries to
$SPARK_GRAFT_PLANS_DIR/<q>_<tag>.txt (default plans/r17).

Usage: python scripts/dump_plans.py <tag> [query ...]
Defaults to every bench-basket query. Streaming queries whose fn runs a
query to completion (returning a batch DataFrame of results) still
explain fine — the plan is the final batch frame's.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from kstreamjs_spark.plans import explain_str  # noqa: E402
from kstreamjs_spark.queries import all_queries  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402

def main() -> int:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    out_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR", "plans/r17")
    os.makedirs(out_dir, exist_ok=True)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans", cpus=8, shuffle_partitions=8)
    qs = all_queries()
    names = [n for n, s in sorted(qs.items()) if (n in only if only else s.bench)]
    for name in names:
        try:
            df = qs[name].fn(spark, sf)
            plan = explain_str(df, "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {type(e).__name__}: {e}"
        with open(f"{out_dir}/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        print("wrote", name)
    spark.stop()
    return 0

if __name__ == "__main__":
    raise SystemExit(main())

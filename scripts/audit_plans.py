"""Plan red-flag audit over every registered query (round 16).

For each query: build the DataFrame at the given SF and scan the
formatted plan for shapes that do not survive scale-up —
CartesianProduct / BroadcastNestedLoopJoin, Python kernels fed directly
by an unwidened one-split scan, and exchanges whose output carries a
text/blob payload column. Prints one line per flag.

Usage: python scripts/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from kstreamjs_spark.plans import explain_str  # noqa: E402
from kstreamjs_spark.queries import all_queries  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402

PAYLOAD = re.compile(r"\b(text|blob)#\d+")


def audit(plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("BroadcastNestedLoopJoin")
    body = plan.split("== Physical Plan ==")[-1]
    sections = re.split(r"\n\(\d+\) ", "\n" + body)
    for sec in sections:
        head = sec.split("\n", 1)[0]
        if head.startswith("Exchange"):
            m = re.search(r"Output(?: \[\d+\])?: \[([^\]]*)\]", sec)
            if m and PAYLOAD.search(m.group(1)):
                flags.append(f"payload-in-exchange [{m.group(1)[:90]}]")
    # Python kernel whose direct child chain is a bare parquet scan
    # (no exchange between) — the single-task shape
    tree = body.split("\n\n")[0]
    lines = tree.splitlines()
    for i, ln in enumerate(lines):
        if "MapInPandas" in ln or "FlatMapGroupsInPandas" in ln:
            depth = len(ln) - len(ln.lstrip())
            for nxt in lines[i + 1:]:
                nd = len(nxt) - len(nxt.lstrip())
                if nd <= depth and nxt.strip():
                    if "Exchange" in nxt or "Scan ExistingRDD" in nxt:
                        break
                    if "Scan parquet" in nxt:
                        flags.append("python-kernel-on-bare-scan")
                        break
    return flags


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("audit-plans", cpus=8, shuffle_partitions=8)
    n_flagged = 0
    for name, spec in sorted(all_queries().items()):
        try:
            plan = explain_str(spec.fn(spark, sf))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: BUILD-ERROR {type(e).__name__}: {e}")
            n_flagged += 1
            continue
        flags = audit(plan)
        if flags:
            n_flagged += 1
            print(f"{name}: {'; '.join(flags)}")
    print(f"\n{n_flagged} flagged")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Duplicated-subtree audit over every registered query (round 16).

The plan red-flag audit (audit_plans.py) catches shapes that are wrong
on their face; this one catches the guide §3.3 lineage problem the
round's biggest wins came from: an EXPENSIVE projection (Python kernel,
higher-order-function fold, shingle transform) replayed under more than
one consumer subtree because no lineage cut separates them.

Heuristics, per query plan:
- same parquet table scanned >= 3 times (2 is normal for a self-join
  whose two sides prune different columns);
- the same Project expression text containing a higher-order function
  (transform(/aggregate(/filter( over a lambdafunction) appearing in
  >= 2 distinct plan nodes;
- MapInPandas / FlatMapGroupsInPandas / ArrowEvalPython appearing >= 2
  times with an identical function tag.

Usage: python scripts/audit_dup_subtrees.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

from kstreamjs_spark.plans import explain_str  # noqa: E402
from kstreamjs_spark.queries import all_queries  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402


def audit(plan: str) -> list[str]:
    flags: list[str] = []
    body = plan.split("== Physical Plan ==")[-1]
    scans = Counter(
        re.findall(r"FileScan parquet \S*?(\w+\.parquet)", body)
        or re.findall(r"file:[^\],]*/(\w+)\.parquet", body)
    )
    for tbl, n in scans.items():
        if n >= 3:
            flags.append(f"table-scanned-{n}x [{tbl}]")
    # HOF projections: normalize expression ids away, hash the text
    hofs = Counter()
    for m in re.finditer(r"(transform|aggregate|filter)\([^\n]{80,600}", body):
        txt = re.sub(r"#\d+L?", "#", m.group(0))[:400]
        if "lambdafunction" in txt:
            hofs[txt] += 1
    dup_hofs = sum(1 for c in hofs.values() if c >= 2)
    if dup_hofs:
        flags.append(f"dup-hof-projections x{dup_hofs}")
    pykernels = Counter(
        re.sub(r"#\d+L?", "#", m)
        for m in re.findall(
            r"(?:MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython)"
            r" [^\n]{0,200}",
            body,
        )
    )
    for k, c in pykernels.items():
        if c >= 2:
            flags.append(f"dup-python-kernel x{c} [{k[:80]}]")
    return flags


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("audit-dups", cpus=8, shuffle_partitions=8)
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

"""Local mirror of the driver's correctness gate: run every registered
query through Spark AND its DuckDB oracle on the same parquet, compare
row count, column names, and order-insensitive values.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from kstreamjs_spark.queries import all_queries  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402
from kstreamjs_spark.testing import compare_query, duck_connection  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("selfcheck", cpus=8, shuffle_partitions=8)
    con = duck_connection(sf)
    failures = []
    for name, spec in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            problems = compare_query(spark, con, spec, sf)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: error: {type(e).__name__}: {e}")
            continue
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        elif spec.oracle is None:
            print(f"okNA {name}: (rows-only check)")
        else:
            print(f"PASS {name}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

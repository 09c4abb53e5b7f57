"""Command-line runner: the user-facing entry point for ad-hoc use.

    python -m kstreamjs_spark list [--tag TAG]
    python -m kstreamjs_spark run q07_pricing_summary [--sf DIR] [--show N]
    python -m kstreamjs_spark explain q26_jaccard_neardup [--mode MODE]

`list` prints the registered query inventory (SURVEY.md §2B); `run`
executes one query on the given scale-factor directory and prints the
first rows; `explain` prints the physical plan — the same plans the
tests in tests/test_plans.py assert on.
"""

from __future__ import annotations

import argparse
import sys


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m kstreamjs_spark",
        description="PySpark analytics engine — query runner",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    lst = sub.add_parser("list", help="list registered queries")
    lst.add_argument("--tag", help="filter by tag substring")

    run = sub.add_parser("run", help="run one query and print rows")
    run.add_argument("name")
    run.add_argument("--sf", default="/root/testdata/sf0.01",
                     help="scale-factor directory with the parquet tables")
    run.add_argument("--show", type=int, default=20,
                     help="rows to print (0 = only the count)")
    run.add_argument("--cpus", type=int, default=8)

    exp = sub.add_parser("explain", help="print a query's physical plan")
    exp.add_argument("name")
    exp.add_argument("--sf", default="/root/testdata/sf0.01")
    exp.add_argument("--mode", default="formatted",
                     choices=["simple", "extended", "formatted", "codegen"])
    exp.add_argument("--cpus", type=int, default=8)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    from .queries import all_queries

    specs = all_queries()
    if args.cmd == "list":
        for name, spec in sorted(specs.items()):
            if args.tag and not any(args.tag in t for t in spec.tags):
                continue
            oracle = "hash-matched" if spec.oracle else "rows-only"
            bench = " [bench]" if spec.bench else ""
            print(f"{name:36s} {oracle:12s} {','.join(spec.tags)}{bench}")
        return 0

    if args.name not in specs:
        print(f"unknown query: {args.name!r} (see `list`)", file=sys.stderr)
        return 2
    from .session import get_spark

    spark = get_spark("kstreamjs-cli", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    try:
        df = specs[args.name].fn(spark, args.sf)
        if args.cmd == "explain":
            from .plans import explain_str

            print(explain_str(df, mode=args.mode))
        elif args.show:
            # one execution: show() itself reports truncation; a separate
            # count() would re-run the whole query
            df.show(args.show, truncate=False)
        else:
            print(f"{df.count()} rows")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())

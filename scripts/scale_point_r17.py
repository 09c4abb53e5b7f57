"""Compute-bound scale point (round 17, r16 verdict #3).

The sf0.1 bench basket is scheduling/driver-overhead bound: PERF_r16's
8-vs-32-core ratios are all <= ~1.0, so the basket cannot demonstrate
parallel scaling at all. This script adds the missing compute-bound
point: a 10x corpus (built deterministically from sf0.1, disjoint
copies so pair/cluster structure scales linearly instead of
quadratically) run of the top compute rows at 8 and 32 cores, where
the dedup/minhash rows are expected to scale >> 1x.

Usage:
    python scripts/scale_point_r17.py build [DIR]        # write the 10x tables
    python scripts/scale_point_r17.py run CPUS [DIR]     # time the rows, one JSON line
    python scripts/scale_point_r17.py oracle [DIR]       # duckdb cross-check of q56/q26 rows

Corpus construction (seeded by the sf0.1 parquet, no randomness):
- documents x10: copy c offsets doc_id by c*N and prefixes every token
  with "b{c}_" — vocabularies are DISJOINT across copies, so q26b/q56
  near-dup pairs exist only within a copy (10x pairs, not 100x) and
  connected components never bridge copies.
- lineitem x10 (q176): copy c offsets l_orderkey and l_partkey — 10
  disjoint co-purchase graphs, 10x nodes and edges.
- every other table is copied through unchanged (only loaded, not
  scaled, by the five rows measured here).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

DEFAULT_DIR = "/tmp/sfx10_r17"
SRC = "/root/testdata/sf0.1"
COPIES = 10
QUERIES = (
    "q26b_minhash_neardup",
    "q56_dup_clusters",
    "q205b_stream_minhash_verify",
    "q176_copurchase_pagerank",
    "q216_wordpiece_tokenize",
)


def build(out: str) -> None:
    from kstreamjs_spark.session import get_spark

    spark = get_spark("scale-point-build", cpus=32)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for c in range(COPIES):
        blk = F.lit(f"b{c}_")
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(c * n_docs)).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split("text", " "), lambda t: F.concat(blk, t)
                    ),
                    " ",
                ).alias("text"),
                *[
                    F.col(col)
                    for col in docs.columns
                    if col not in ("doc_id", "text")
                ],
            )
        )
    big_docs = parts[0]
    for p in parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    max_ok = li.agg(F.max("l_orderkey")).first()[0] + 1
    max_pk = li.agg(F.max("l_partkey")).first()[0] + 1
    lparts = []
    for c in range(COPIES):
        lparts.append(
            li.select(
                (F.col("l_orderkey") + F.lit(c * max_ok)).alias("l_orderkey"),
                (F.col("l_partkey") + F.lit(c * max_pk)).alias("l_partkey"),
                *[
                    F.col(col)
                    for col in li.columns
                    if col not in ("l_orderkey", "l_partkey")
                ],
            )
        )
    big_li = lparts[0]
    for p in lparts[1:]:
        big_li = big_li.unionByName(p)
    big_li.repartition(32).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )

    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "events",
        "embeddings",
    ):
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{name}.parquet")
    spark.stop()
    print(json.dumps({"built": out, "copies": COPIES, "docs": n_docs * COPIES}))


def run(cpus: int, data: str) -> None:
    from kstreamjs_spark.queries import all_queries
    from kstreamjs_spark.session import get_spark

    spark = get_spark("scale-point-run", cpus=cpus)
    qs = all_queries()
    load0 = round(os.getloadavg()[0], 2)
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"scale-point {name}")
        fn = qs[name].fn
        rows[name] = len(fn(spark, data).collect())  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, data).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "scale_point_x10_wall",
                "cpus": cpus,
                "data": data,
                "copies": COPIES,
                "queries": timings,
                "rows": rows,
                "loadavg_1m_start": load0,
                "loadavg_1m_after": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


def oracle(data: str) -> None:
    """DuckDB cross-check on the 10x corpus for the oracle-checkable
    rows (q26b has no oracle; q205b's is closed-form) — proves the
    scaled corpus still computes the same answers on both engines."""
    import duckdb

    from kstreamjs_spark.queries import all_queries
    from kstreamjs_spark.session import get_spark
    from kstreamjs_spark.tables import TABLES

    spark = get_spark("scale-point-oracle", cpus=32)
    qs = all_queries()
    # testing.duck_connection expects one file per table; the 10x tables
    # are parquet DIRECTORIES, so glob them here.
    con = duckdb.connect()
    for t in TABLES:
        p = f"{data}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    con.execute("SET threads TO 32")
    out = {}
    for name in ("q56_dup_clusters", "q176_copurchase_pagerank",
                 "q216_wordpiece_tokenize"):
        sql = qs[name].oracle
        eng = [tuple(r) for r in qs[name].fn(spark, data).collect()]
        ora = [tuple(r) for r in con.execute(sql).fetchall()]
        out[name] = {"rows": len(eng), "match": eng == ora}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    if cmd == "build":
        build(sys.argv[2] if len(sys.argv) > 2 else DEFAULT_DIR)
    elif cmd == "run":
        run(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else DEFAULT_DIR)
    elif cmd == "oracle":
        oracle(sys.argv[2] if len(sys.argv) > 2 else DEFAULT_DIR)
    else:
        raise SystemExit(f"unknown command {cmd}")

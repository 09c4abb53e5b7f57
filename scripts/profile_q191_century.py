"""Century sweep for PQ ANN (q191): seeded synthetic dim-64 vector
tables at 1x/10x/100x of 20,000 rows, wall + event-log task-seconds
for THREE costs: the one-time offline index build (codebooks + codes
table, amortized over all queries), the ONLINE served query
(`pq_query_encoded` over the persisted codes table + constant rerank),
and exact brute-force cosine on the raw table.

The claims: the online ADC scan is linear in N with a far smaller
per-row constant than the exact fold cosine (an int-array LUT sum over
a ~16x smaller table vs a 64-term double fold over raw vectors), the
rerank is CONSTANT in N (k * rerank = 80 id-fetches), and the encode
pass — the inline `pq_topk` form's dominant cost — is paid once.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts \
           python scripts/profile_q191_century.py [mult ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from kstreamjs_spark.operators import similarity  # noqa: E402
from profile_q26_century import build_session, stage_report  # noqa: E402
from profile_q175_century import _clear_evdir  # noqa: E402


def vectors_path(spark, mult: int, base_rows: int = 20_000) -> str:
    n = base_rows * mult
    path = f"/tmp/pq_century_vectors_{n}"
    if not os.path.exists(path):
        df = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.rand(1234 + i) * 2 - 1 for i in range(64)]).alias(
                "embedding"
            ),
        )
        df.write.mode("overwrite").parquet(path)
    return path


def _measured(evdir, fn):
    _clear_evdir(evdir)
    spark = build_session(False)
    t0 = time.perf_counter()
    out = fn(spark)
    wall = time.perf_counter() - t0
    spark.stop()
    time.sleep(2)
    report = []
    for entry in os.listdir(evdir):
        report.extend(stage_report(os.path.join(evdir, entry)))
    return out, round(wall, 1), round(
        sum(s.get("task_s") or 0.0 for s in report), 1
    )


def main() -> int:
    mults = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [
        1, 10, 100,
    ]
    evdir = "/tmp/spark-events-q26"
    results = []
    for mult in mults:
        spark = build_session(False)
        path = vectors_path(spark, mult)
        spark.stop()
        time.sleep(1)
        codes_path = f"{path}_codes"
        row = {"mult": mult}

        def build(spark):
            vec = spark.read.parquet(path)
            books = similarity.pq_codebooks(vec, m=16, n_cent=16)
            similarity.pq_encode(vec, books, dim=64).select(
                "vec_id", "codes"
            ).write.mode("overwrite").parquet(codes_path)
            return books

        books, row["build_wall_s"], row["build_task_s"] = _measured(
            evdir, build
        )

        def served(spark):
            vec = spark.read.parquet(path)
            codes = spark.read.parquet(codes_path)
            qv = vec.filter(F.col("vec_id") == 0).select(
                similarity.as_double(F.col("embedding")).alias("qv")
            )
            return [
                r["vec_id"]
                for r in similarity.pq_query_encoded(
                    codes, vec, books, qv, k=10, rerank=8
                ).collect()
            ]

        got, row["query_wall_s"], row["query_task_s"] = _measured(
            evdir, served
        )
        row["query_rank1"] = got[0] if got else None

        def exact(spark):
            vec = spark.read.parquet(path)
            qv = vec.filter(F.col("vec_id") == 0).select(
                similarity.as_double(F.col("embedding")).alias("qv")
            )
            return [
                r["vec_id"]
                for r in similarity.topk_cosine(vec, qv, k=10).collect()
            ]

        got, row["exact_wall_s"], row["exact_task_s"] = _measured(
            evdir, exact
        )
        row["exact_rank1"] = got[0] if got else None
        results.append(row)
        print(f"=== {json.dumps(row)} ===", flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Decade sweep for the q221 chunk-dedup-with-reconstruction shape:
documents table multiplied 1x/10x/100x, warm min-of-3 wall in ONE session
(the JIT-honest regime SCALE.md's q203 section established).

Measures the docstring's bill: the dedup shuffle carries
(doc_id, st, cfp) — ~20 bytes a chunk — and the reconstruction is one
equi-join of per-doc kept-start lists back to the scan, so 10x
documents should cost ~linear task work over the fixed ~5-stage
scheduling floor.

The multiplier keeps doc_ids distinct (doc_id + i*N) and makes each
copy's TEXT distinct by prefixing a copy-unique token — otherwise the
10x corpus is 90% exact chunk duplicates and the kept-set collapses
to the 1x corpus (a cheaper, unrepresentative reconstruct).

Usage: python scripts/profile_q221_decade.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from kstreamjs_spark.queries import all_queries  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("q221-decade", cpus=32, shuffle_partitions=32)
    base = spark.read.parquet(f"{sf}/documents.parquet")
    n = base.count()
    fn = all_queries()["q221_chunk_dedup_rebuild"].fn
    results = []
    for mult in (1, 10, 100):
        parts = [base]
        for i in range(1, mult):
            parts.append(
                base.select(
                    (F.col("doc_id") + i * n).alias("doc_id"),
                    F.concat(
                        F.lit(f"c{i}x "), F.col("text")
                    ).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        tmp = f"/tmp/q221_decade_{mult}x.parquet"
        big.write.mode("overwrite").parquet(tmp)

        # point the query at a dir holding the multiplied table
        import os
        import shutil

        d = f"/tmp/q221_decade_sf_{mult}x"
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        os.rename(tmp, f"{d}/documents.parquet")

        walls = []
        for _ in range(3):
            t0 = time.time()
            out = fn(spark, d)
            rows = out.count()
            walls.append(time.time() - t0)
        results.append(
            {
                "mult": mult,
                "rows": rows,
                "wall_min3": round(min(walls), 2),
            }
        )
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps({"sf": sf, "points": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

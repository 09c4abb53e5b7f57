"""Decade sweep for the q218 NN-Descent graph-construction shape:
embeddings table multiplied 1x/10x, warm min-of-3 wall in ONE session
(the JIT-honest regime SCALE.md's q203 section established).

Measures the docstring's bill: per-round candidate work is
N * (2k)^2 cosines (reverse degree capped at k, so no hub can widen
the self-join) — 10x vectors should cost ~linear task work under the
fixed iters x ~4-stage scheduling floor.

The multiplier keeps the id space DENSE (vec_id + i*N, not the stress
helper's 100M stride — nn_descent validates density) and makes each
copy's vectors DISTINCT by rotating the embedding array i positions
(same distribution, no artificial duplicate-tie structure).

Usage: python scripts/profile_q218_decade.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from kstreamjs_spark.operators import similarity  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k, iters = 20, 3  # the per-round bill is the claim; iters fixed
    spark = get_spark("q218-decade", cpus=32, shuffle_partitions=32)
    base = spark.read.parquet(f"{sf}/embeddings.parquet")
    n = base.count()
    # derive the dimension from the data — a hardcoded 64 would
    # silently truncate rotated copies on any other corpus
    dim = base.select(F.size("embedding")).first()[0]
    results = []
    for mult in (1, 10):
        parts = [base.select("vec_id", "embedding")]
        for i in range(1, mult):
            rot = F.concat(
                F.slice("embedding", i + 1, dim - i),
                F.slice("embedding", 1, i),
            )
            parts.append(
                base.select(
                    (F.col("vec_id") + i * n).alias("vec_id"),
                    rot.alias("embedding"),
                )
            )
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big = big.localCheckpoint()  # input materialized; sweep times
        # the DESCENT, not the multiplier plumbing

        def run():
            return similarity.nn_descent(big, k=k, iters=iters).count()

        walls, rows = [], 0
        for _ in range(3):
            t0 = time.perf_counter()
            rows = run()
            walls.append(time.perf_counter() - t0)
        results.append(
            {"mult": mult, "n_vectors": n * mult, "graph_rows": rows,
             "k": k, "iters": iters,
             "wall_min3_s": round(min(walls), 2),
             "walls": [round(w, 2) for w in walls]}
        )
        print(f"=== mult={mult}: N={n * mult}, {rows} edges, min-of-3 "
              f"{min(walls):.2f}s {walls} ===", flush=True)
    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

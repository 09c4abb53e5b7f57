"""Scaling stress: run the compute-heavy operators on 1x/2x/4x corpus
multiples (union with shifted ids — no writes) and report the scaling
exponent time ~ N^p. p ≈ 1 is the linear scaling the 100 TB design
requires; p >= 2 would mean a hidden all-pairs blow-up.

Usage: python scripts/stress.py [sf_dir] [max_mult]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from kstreamjs_spark.operators import cluster, dedup, similarity  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402
from kstreamjs_spark.tables import load  # noqa: E402


def multiply(df, id_col, mult):
    out = df
    for i in range(1, mult):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + i * 100_000_000)
        )
    return out


def timed(fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("stress", cpus=32)
    (docs,) = load(spark, sf, "documents")
    (emb,) = load(spark, sf, "embeddings")
    docs.count()

    ops = {
        # partition_col=None: worst case, no blocking key bounds candidates
        "jaccard": lambda d: dedup.jaccard_pairs(
            d, threshold=0.5, partition_col=None
        ).count(),
        "minhash_lsh": lambda d: dedup.minhash_neardup_pairs(d).count(),
        "simhash": lambda d: dedup.simhash_neardup_pairs(d).count(),
        # the realistic dedup tail: LSH candidate pairs -> cluster labels;
        # rounds = component diameter, so clone cliques (diameter 1) keep
        # the iteration count flat as the corpus multiplies
        "cc_minhash": lambda d: cluster.connected_components(
            dedup.minhash_neardup_pairs(d), src="d1", dst="d2"
        ).count(),
    }
    mults = [m for m in (1, 2, 4, 8) if m <= max_mult]
    results: dict[str, list[float]] = {k: [] for k in ops}
    for mult in mults:
        d = multiply(docs, "doc_id", mult)
        n = d.count()
        for name, fn in ops.items():
            sec = timed(lambda: fn(d))
            results[name].append(sec)
            print(f"mult={mult} ({n} docs) {name}: {sec:.2f}s", flush=True)

    # cosine top-k on multiplied embeddings (scan-bound — must be ~linear)
    e4 = multiply(emb, "vec_id", max_mult)
    qv = emb.filter(F.col("vec_id") == 0).select(
        similarity.as_double(F.col("embedding")).alias("qv")
    )
    t1 = timed(lambda: similarity.topk_cosine(emb, qv, k=10).collect())
    t4 = timed(lambda: similarity.topk_cosine(e4, qv, k=10).collect())
    print(f"cosine_topk: 1x={t1:.2f}s {max_mult}x={t4:.2f}s", flush=True)

    print("\nscaling exponents (time ~ N^p, fit on largest step):")
    for name, ts in results.items():
        if len(ts) >= 2 and ts[0] > 0:
            p = math.log(ts[-1] / ts[0]) / math.log(mults[len(ts) - 1])
            print(f"  {name}: p = {p:.2f}")
    p_cos = math.log(max(t4, 1e-9) / max(t1, 1e-9)) / math.log(max_mult)
    print(f"  cosine_topk: p = {p_cos:.2f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

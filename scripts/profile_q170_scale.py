"""Scale profile for q170's SemDeDup cell-bounded pair join (round 10).

q170's docstring makes a quantitative claim the fixture alone cannot
evidence: within-cell pairwise cosine costs sum(n_c^2) — never N^2 —
so at constant CELL SIZE (k scaled with N, the production operating
point) the pair join should scale ~linearly in N, while a FIXED k
(cells growing with the corpus) is quadratic by construction. This
script measures both, on the q26-century protocol: generator-backed
vectors at 1x/10x/100x, Spark event log enabled, claims made on
executor TASK-SECONDS per job group (host-load independent; wall clock
on this box is +-40% noise for identical plans — SCALE.md round 7).

The assignment phase is deliberately simulated with a hash cid (its
real cost — one codegen projection over the scan, zero shuffles — is
q81's already-measured story; at k beyond a few hundred the literal
expression tree should anyway give way to a broadcast-codebook pandas
scorer, the IVF path's machinery). What this isolates is exactly the
NEW q170 claim: the cid equi-join's quadratic-in-cell-size /
linear-in-cell-count cost shape.

Usage: python scripts/profile_q170_scale.py [mult ...]  (default 1 10 100)
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import pyspark.sql.functions as F  # noqa: E402

from profile_q26_century import build_session  # noqa: E402
from profile_q56_century import group_task_seconds  # noqa: E402

EVDIR = "/tmp/spark-events-q26"  # build_session's fixed event-log dir

DIM = 32
BASE_N = 5_000
BASE_K = 8  # -> 625 vectors/cell at every scaled point


def vectors(spark, n: int):
    """Deterministic synthetic embeddings: dim-32 arrays derived from
    the row id by a sin-hash (no data files needed at 100x)."""
    df = spark.range(n).withColumnRenamed("id", "vec_id")
    v = F.array(
        *[
            F.sin(F.col("vec_id") * F.lit(0.7 + 0.13 * i) + F.lit(i))
            for i in range(DIM)
        ]
    )
    return df.withColumn("v", v)


def semdedup_pairs(df, k: int, theta: float = 0.2):
    """The q170 pair/drop core on a precomputed cid: within-cell
    equi-join, 6-dp-rounded cosine >= theta, distinct dropped ids."""
    a = df.withColumn("cid", F.pmod(F.hash(F.col("vec_id")), F.lit(k)))
    left = a.select("cid", F.col("vec_id").alias("i"), F.col("v").alias("vi"))
    right = a.select("cid", F.col("vec_id").alias("j"), F.col("v").alias("vj"))
    dot = F.aggregate(
        F.zip_with("vi", "vj", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        left.join(right, "cid")
        .filter(F.col("i") < F.col("j"))
        .filter(
            F.round(dot / (norm(F.col("vi")) * norm(F.col("vj"))), 6)
            >= F.lit(theta)
        )
        .select("cid", "j")
        .distinct()
        .groupBy("cid")
        .count()
    )


def run_point(mult: int, scale_k: bool) -> dict:
    spark = build_session(tmpfs=False, parts=max(64, 32 * mult))
    sc = spark.sparkContext
    n = BASE_N * mult
    k = BASE_K * (mult if scale_k else 1)
    label = f"m{mult}_{'scaledk' if scale_k else 'fixedk'}"
    t0 = time.time()
    sc.setJobGroup(label, label)
    out = semdedup_pairs(vectors(spark, n), k).collect()
    wall = time.time() - t0
    app_id = sc.applicationId
    spark.stop()
    time.sleep(1.0)
    evlog = max(
        glob.glob(os.path.join(EVDIR, f"*{app_id}*")), key=os.path.getmtime
    )
    groups = group_task_seconds(evlog)
    task_s = sum(g["task_s"] for gname, g in groups.items() if gname == label)
    return {
        "mult": mult,
        "n": n,
        "k": k,
        "cell_size": n / k,
        "dropped_cells": len(out),
        "wall_s": round(wall, 2),
        "task_s": round(task_s, 2),
    }


def run_degenerate(mult: int, max_cell: int | None) -> dict:
    """Round-11: the adversarial geometry the max_cell ceiling exists
    for — EVERY vector lands in ONE cell (a botched embedder emitting a
    single direction; q115's failure mode). Measures the REAL operator
    (`similarity.semdedup_drops`), uncapped (quadratic, C(N,2) pairs)
    vs capped (sub-split: ~ceil(N/max_cell)*C(max_cell,2) pairs —
    linear in N at fixed max_cell)."""
    from kstreamjs_spark.operators import similarity

    spark = build_session(tmpfs=False, parts=max(64, 32 * mult))
    sc = spark.sparkContext
    n = BASE_N * mult
    a = vectors(spark, n).withColumn("cid", F.lit(0).cast("long"))
    label = f"degen_m{mult}_{'cap' + str(max_cell) if max_cell else 'uncapped'}"
    t0 = time.time()
    sc.setJobGroup(label, label)
    n_drops = similarity.semdedup_drops(
        a, theta=0.2, id_col="vec_id", vec_col="v", max_cell=max_cell
    ).count()
    wall = time.time() - t0
    app_id = sc.applicationId
    spark.stop()
    time.sleep(1.0)
    evlog = max(
        glob.glob(os.path.join(EVDIR, f"*{app_id}*")), key=os.path.getmtime
    )
    groups = group_task_seconds(evlog)
    task_s = sum(g["task_s"] for gname, g in groups.items() if gname == label)
    return {
        "geometry": "all_one_cell",
        "mult": mult,
        "n": n,
        "max_cell": max_cell,
        "n_drops": n_drops,
        "wall_s": round(wall, 2),
        "task_s": round(task_s, 2),
    }


def main_degenerate() -> None:
    for mult in (1, 2):
        for cap in (None, 625):
            print(json.dumps(run_degenerate(mult, cap)), flush=True)


def main() -> None:
    if sys.argv[1:2] == ["--degenerate"]:
        main_degenerate()
        return
    mults = [int(m) for m in sys.argv[1:]] or [1, 10, 100]
    rows = []
    for m in mults:
        rows.append(run_point(m, scale_k=True))
        print(json.dumps(rows[-1]), flush=True)
    # the documented contrast: fixed k at 10x -> cells grow 10x ->
    # within-cell pairs grow ~100x (quadratic regime, by design)
    rows.append(run_point(10, scale_k=False))
    print(json.dumps(rows[-1]), flush=True)
    scaled = [r for r in rows if r["k"] != BASE_K or r["mult"] == 1]
    if len(scaled) >= 2:
        a, b = scaled[0], scaled[-1]
        p = math.log(b["task_s"] / a["task_s"]) / math.log(b["n"] / a["n"])
        print(json.dumps({"scaledk_exponent": round(p, 2)}))


if __name__ == "__main__":
    main()

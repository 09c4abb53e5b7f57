"""Profile the q26 (jaccard_pairs) generator-backed century point.

The r6 sweep measured a super-linear second decade (p=1.54) and
attributed it to pinned shuffle partitions; the r7 re-run with scaled
partitions (64->640->1024) AND a 32g heap reproduced the same wall time
(431 s vs 435 s), refuting that attribution. This script finds the real
regime change: it runs the 10x and 100x points once each with the Spark
event log enabled, then prints per-stage wall time, task time, and
shuffle/spill volumes, plus an optional tmpfs-shuffle variant
(--tmpfs) that moves spark.local.dir to /dev/shm to test the
disk-spill-IO hypothesis.

Usage: python scripts/profile_q26_century.py [--tmpfs] [mult ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from kstreamjs_spark.operators import dedup  # noqa: E402
from kstreamjs_spark.session import configure_runtime  # noqa: E402


def build_session(tmpfs: bool, mem: str = "32g", parts: int = 64) -> SparkSession:
    evdir = "/tmp/spark-events-q26"
    os.makedirs(evdir, exist_ok=True)
    b = (
        SparkSession.builder.appName("profile-q26")
        .master("local[32]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", mem)
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
    )
    if tmpfs:
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        b = b.config("spark.local.dir", shm)
    spark = b.getOrCreate()
    configure_runtime(spark)
    return spark


def corpus(spark: SparkSession, mult: int, base_rows: int = 5000):
    from kstreamjs_spark.sources import docgen as _dg

    _dg.register(spark)
    total = base_rows * mult
    d = (
        spark.read.format("docgen")
        .option("partitions", 32)
        .option("rows_per_partition", max(1, total // 32))
        .option("seed", 11)
        .load()
    )
    blk = F.floor(F.col("doc_id") / F.lit(base_rows)).cast("string")
    return d.withColumn(
        "text",
        F.array_join(
            F.transform(
                F.split("text", " "),
                lambda t: F.concat(F.lit("b"), blk, F.lit("_"), t),
            ),
            " ",
        ),
    )


def _event_lines(path: str):
    """Yield JSON lines from a Spark event log — either a single file or
    the Spark 4 rolling directory (eventlog_v2_*/events_*)."""
    files = (
        sorted(glob.glob(f"{path}/events_*"))
        if os.path.isdir(path)
        else [path]
    )
    for fp in files:
        if fp.endswith(".zstd"):
            import pyarrow as pa

            with pa.input_stream(fp, compression="zstd") as f:
                data = f.read().decode()
            yield from data.splitlines()
        else:
            with open(fp) as f:
                yield from f


def stage_report(evlog: str) -> list[dict]:
    """Parse one event log (file or rolling dir): per-stage wall, task
    time, IO. Task metrics accumulate separately because TaskEnd events
    precede their StageCompleted event in the log."""
    stages: dict[int, dict] = {}
    tasks: dict[int, dict] = {}
    for line in _event_lines(evlog):
        try:
            ev = json.loads(line)
        except ValueError:
            continue
        if ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            stages[sid] = {
                "stage": sid,
                "name": si.get("Stage Name", "")[:60],
                "tasks": si.get("Number of Tasks"),
                "wall_s": round((comp - sub) / 1000, 1)
                if sub and comp
                else None,
            }
        elif ev.get("Event") == "SparkListenerTaskEnd":
            sid = ev.get("Stage ID")
            m = ev.get("Task Metrics") or {}
            if not m:
                continue
            t = tasks.setdefault(
                sid,
                {"task_s": 0.0, "gc_s": 0.0, "spill_disk_mb": 0.0,
                 "sh_read_mb": 0.0, "sh_write_mb": 0.0},
            )
            t["task_s"] += m.get("Executor Run Time", 0) / 1000
            t["gc_s"] += m.get("JVM GC Time", 0) / 1000
            t["spill_disk_mb"] += m.get("Disk Bytes Spilled", 0) / 2**20
            srm = m.get("Shuffle Read Metrics") or {}
            t["sh_read_mb"] += (
                srm.get("Local Bytes Read", 0)
                + srm.get("Remote Bytes Read", 0)
            ) / 2**20
            swm = m.get("Shuffle Write Metrics") or {}
            t["sh_write_mb"] += swm.get("Shuffle Bytes Written", 0) / 2**20
    for sid, st in stages.items():
        st.update(
            {k: round(v, 1) for k, v in tasks.get(sid, {}).items()}
        )
    return sorted(stages.values(), key=lambda s: -(s.get("wall_s") or 0))


def main() -> int:
    tmpfs = "--tmpfs" in sys.argv[1:]
    mem = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--mem=")),
        "32g",
    )
    parts = int(next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--parts=")),
        "64",
    ))
    mults = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [10, 100]
    spark = build_session(tmpfs, mem, parts)
    evdir = "/tmp/spark-events-q26"
    for mult in mults:
        d = corpus(spark, mult)
        t0 = time.perf_counter()
        n = dedup.jaccard_pairs(d, threshold=0.5, partition_col=None).count()
        wall = time.perf_counter() - t0
        print(f"\n=== mult={mult} tmpfs={tmpfs}: {n} pairs in {wall:.1f}s ===",
              flush=True)
    spark.stop()
    time.sleep(2)
    for s in stage_report(evdir)[:14]:
        print(json.dumps(s), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

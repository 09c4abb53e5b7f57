"""Sustained streaming throughput at sf1-equivalent scale.

Materializes events x MULT (default 10x sf0.1 = 1M rows — the sf1 row
count) as MANY parquet files in a temp dir, replays them through the q29
tumbling-window aggregation with maxFilesPerTrigger throttling so the run
executes a real MULTI-batch schedule (state store reuse, incremental
planning, watermark advance across batches — the things a single
AvailableNow mega-batch skips), and prints rows/s with the batch count.

Usage: python scripts/stream_throughput.py [sf_dir] [mult] [files] [per_trigger]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from kstreamjs_spark.session import get_spark  # noqa: E402
from kstreamjs_spark.tables import load  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    per_trigger = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    spark = get_spark("stream-throughput", cpus=32)
    (events,) = load(spark, sf, "events")

    big = events
    for i in range(1, mult):
        big = big.unionByName(
            events.withColumn("event_id", F.col("event_id") + i * 100_000_000)
            .withColumn("user_id", F.col("user_id") + i * 100_000_000)
        )

    workdir = tempfile.mkdtemp(prefix="stream_tp_")
    data_dir = f"{workdir}/events"
    ckpt = f"{workdir}/ckpt"
    big.repartition(n_files).write.mode("overwrite").parquet(data_dir)
    n_rows = spark.read.parquet(data_dir).count()

    schema = spark.read.parquet(data_dir).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(per_trigger))
        .parquet(data_dir)
    )
    agg = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
    )
    t0 = time.perf_counter()
    q = (
        agg.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    print(
        f"rows={n_rows} wall={wall:.2f}s rate={n_rows / wall:,.0f} rows/s "
        f"batches={batches} (files={n_files}, per_trigger={per_trigger})",
        flush=True,
    )
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Lakehouse write path end to end: z-ordered WRITE, small-file
APPEND ingest, OPTIMIZE-style COMPACTION, and a partition-pruned
streaming MERGE — the four maintenance shapes a table format gives
you, on plain parquet.

1. write the orders table directory-partitioned by z-order cell
   (`layout.write_zorder_partitioned` — tight min/max footers on BOTH
   clustering dimensions, the data-skipping contract q211 verifies)
2. append two more key-range batches (the small-file state continuous
   ingest leaves behind: one file per batch per cell)
3. compact: `layout.compact_partitions` rewrites ONLY the cells whose
   file count exceeds the threshold — census from the directory
   listing, staged write, per-partition atomic swap (q215)
4. apply a CDC batch with `scd1_upsert_stream`'s bucket-granular
   copy-on-write MERGE: only buckets containing batch keys are
   rewritten, with a JSON manifest per commit (q213)

Run:  python examples/lakehouse_maintenance.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from kstreamjs_spark.operators import layout  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    spark = get_spark("lakehouse-maintenance", cpus=4, shuffle_partitions=4)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    table = os.path.join(tempfile.mkdtemp(), "orders_z")

    x = layout.quantize16(F.col("o_custkey"))
    y = layout.quantize16(F.floor(F.col("o_totalprice")))

    # 1+2: initial write, then two ingest appends (3 files per cell)
    for i in range(3):
        batch = orders.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == i)
        layout.zorder_stage(batch, x, y, file_bits=4).write.mode(
            "append"
        ).partitionBy("zfile").parquet(table)
    n_before = len(glob.glob(table + "/zfile=*/*.parquet"))

    # 3: compact every over-threshold cell to one file
    done = layout.compact_partitions(spark, table, "zfile", max_files=1)
    n_after = len(glob.glob(table + "/zfile=*/*.parquet"))
    total = spark.read.parquet(table).count()
    print(
        f"compaction: {n_before} files -> {n_after} "
        f"({len(done)} cells rewritten), {total} rows intact"
    )

    # 4: partition-pruned streaming MERGE (CDC apply) over events,
    #    with a changelog feed and a time-travel retention horizon
    from kstreamjs_spark.queries.streaming_q import (
        scd1_read_as_of,
        scd1_upsert_stream,
    )
    from kstreamjs_spark.streaming.replay import stream_table

    dim_root = os.path.join(tempfile.mkdtemp(), "dim_user")
    sdf = stream_table(spark, sf_dir, "events")
    dim = scd1_upsert_stream(
        sdf, dim_root, n_buckets=8, changelog=True, retain_commits=2
    )
    print("MERGE result (one row per user, latest state):")
    dim.orderBy("user_id").show(5, truncate=False)
    manifests = sorted(glob.glob(dim_root + "/_manifest/v*.json"))
    n_changes = spark.read.parquet(dim_root + "/_changelog/c*").count()
    asof = scd1_read_as_of(spark, dim_root).count()
    print(
        f"{len(manifests)} manifest commit(s), {n_changes} changelog "
        f"row(s), AS-OF-latest reads {asof} dimension rows"
    )

    # 5: CONCURRENT-WRITER commit API (round 15) — two independent
    #    batch commits against a fresh table root, coordinated only
    #    through the manifest dir. These two run sequentially, so this
    #    step demonstrates the commit API and version chain; the RACE
    #    paths (disjoint-bucket rebase, overlapping-bucket
    #    ConcurrentWriteConflict + recompute) are exercised by the
    #    interleaved-writer pytest in tests/test_streaming.py
    from kstreamjs_spark.queries.streaming_q import scd1_commit_batch

    cc_root = os.path.join(tempfile.mkdtemp(), "dim_cc")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "value"
    )
    v_a = scd1_commit_batch(
        spark, cc_root, ev.filter(F.col("user_id") % 2 == 0)
    )
    v_b = scd1_commit_batch(
        spark, cc_root, ev.filter(F.col("user_id") % 2 == 1)
    )
    n_cc = scd1_read_as_of(spark, cc_root).count()
    print(
        f"concurrent committers landed v{v_a} and v{v_b}; "
        f"merged table holds {n_cc} users"
    )

    shutil.rmtree(os.path.dirname(table), ignore_errors=True)
    shutil.rmtree(os.path.dirname(dim_root), ignore_errors=True)
    shutil.rmtree(os.path.dirname(cc_root), ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))

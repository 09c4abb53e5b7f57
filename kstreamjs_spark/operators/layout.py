"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB the scan you avoid is cheaper than any scan you optimize:
lakehouse tables are laid out so that file/row-group min-max statistics
prune reads. A 1-D sort clusters exactly one column; bit-interleaving
two quantized sort keys (the Z-order curve, public Morton-code
construction — the layout trick behind Delta/Iceberg OPTIMIZE ZORDER)
bounds BOTH columns within every contiguous key range, so predicates on
either column (or both) skip most of the table.

Everything here is plain codegen arithmetic (shift/and/or chains — no
UDF, no shuffle); the engine's `repartitionByRange(zvalue)` or a
`sortWithinPartitions` over the key produces the physical layout, and
the bucketed statistics query (q173) is the evidence that the curve
clusters both dimensions at once.

The reference has no layout surface (its sink is a Kafka topic,
reference src/stream.ts:240-247); this is a north-star extension.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: Number of bits interleaved per dimension (16+16 -> 32-bit z-value).
Z_BITS = 16


def quantize16(col: Column) -> Column:
    """Low-16-bit quantization of an integral column: ``x & 0xFFFF``.
    For doubles, floor first (`F.floor` yields LONG) — callers compose.
    Symbol-for-symbol mirrored by `quantize16_sql`."""
    return col.cast("long").bitwiseAND(F.lit(65535))


def zvalue(x16: Column, y16: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two ``bits``-bit ints: bit b of x lands at
    position 2b, bit b of y at 2b+1. A chain of 2*bits shift/and/or
    terms — one codegen expression, zero Python, zero shuffle."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x16, b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y16, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def quantize16_sql(expr: str) -> str:
    """DuckDB mirror of `quantize16` (expr must already be BIGINT)."""
    return f"({expr} & 65535)"


def zvalue_sql(x_expr: str, y_expr: str, bits: int = Z_BITS) -> str:
    """DuckDB mirror of `zvalue`: the identical shift/and/or chain over
    two BIGINT expressions, OR-folded (non-overlapping bit positions)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x_expr} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y_expr} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(terms) + ")"


def write_zorder_partitioned(
    df: DataFrame,
    path: str,
    x16: Column,
    y16: Column,
    file_bits: int = 4,
) -> None:
    """Materialize the z-ordered LAKEHOUSE LAYOUT: directory-partition
    by the top ``file_bits*2`` interleaved bits of the z-value (a
    deterministic z-range per directory — 2**(2*file_bits) cells), and
    z-sort rows WITHIN each file so row-group min-max footers stay
    tight on BOTH dimensions. One shuffle (hash on the cell id), one
    file per cell (each distinct cell hashes to exactly one task).

    At 100 TB the same plan swaps the deterministic cell id for
    ``repartitionByRange(n_files, z)`` to balance file SIZES instead
    of curve cells; the deterministic form here keeps the manifest
    closed-form so the write is oracle-checkable end-to-end (q211)."""
    zorder_stage(df, x16, y16, file_bits).write.mode(
        "overwrite"
    ).partitionBy("zfile").parquet(path)


def zorder_stage(
    df: DataFrame, x16: Column, y16: Column, file_bits: int = 4
) -> DataFrame:
    """The staging plan behind :func:`write_zorder_partitioned`, shared
    with the STREAMING ingest path (q211b writes each micro-batch
    through this with mode('append')): cell id = top interleaved z
    bits, one exchange hashed on it, rows z-sorted within."""
    z = zvalue(x16, y16)
    shift = 2 * Z_BITS - 2 * file_bits
    return (
        df.withColumn("zfile", F.shiftright(z, shift))
        .withColumn("__z", z)
        .repartition("zfile")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def compact_partitions(
    spark,
    root: str,
    partition_col: str = "zfile",
    max_files: int = 1,
) -> list[tuple[str, int, int]]:
    """Lakehouse OPTIMIZE-style SMALL-FILE COMPACTION (round 14) — the
    maintenance half of the write path next to q211b's streaming
    appends and q213's partition-pruned MERGE: continuous micro-batch
    ingest leaves one small file per batch per partition; this
    operator rewrites ONLY the partitions whose file count exceeds
    ``max_files``, coalescing each to a single z-run, and leaves every
    other partition's files physically untouched (the partition-pruned
    contract, pytest-pinned by mtime).

    Protocol (the copy-on-write + swap idiom q213 established —
    staged writes sidestep Spark's cannot-overwrite-a-read-path rule
    without materializing anything driver-side):

    1. CENSUS from the directory listing (the manifest stand-in; a
       metadata op, no data scan): partitions with > max_files files.
    2. One job writes those partitions' rows to a staging dir,
       repartitioned BY the partition column (all rows of a partition
       land in one task -> exactly one output file per partition),
       z-sorted within when the data carries a __z/sort column's
       ordering already (parquet preserves row order per file, so
       re-reading concatenated z-runs and writing one file keeps rows
       grouped; footers stay tight because each source file was
       z-sorted and the groups concatenate).
    3. Per-partition atomic swap: os.rename the old dir out (into a
       trash slot INSIDE the staging dir — never under the table root,
       so a crash mid-swap can't leave a dir the census would parse as
       a ghost partition), the staged dir in, then drop the old
       copies. Readers resolving the table path never see a
       half-compacted partition.

    Crash recovery (round 15): a crash between the two renames leaves
    the partition MISSING from the table and its old copy in the
    staging trash slot. The census therefore starts by recovering any
    orphaned staging dir from a previous run: a trash slot whose
    partition is absent from the table root is renamed BACK (the swap
    never completed — the old data is still the truth); one whose
    partition is present is dropped (the swap completed, only the
    cleanup died). Only then is the staging dir cleared.

    Returns [(partition_value, files_before, files_after)] for the
    compacted partitions. At 100 TB: the census comes from the real
    table-format manifest, step 2 batches partitions into size-bounded
    compaction groups, and the swap is a manifest commit — the shape
    here is that protocol minus the format dependency."""
    import os
    import shutil

    prefix = f"{partition_col}="
    staging = root.rstrip("/") + "__compact_staging"
    trash_prefix = "__trash__"
    # Recover a previous run's orphaned staging dir BEFORE the census:
    # a trash slot whose partition is missing from the table root marks
    # a crash between the two swap renames — restore it (the old data
    # is still the truth); one whose partition exists marks a completed
    # swap whose cleanup died — safe to drop with the staging dir.
    if os.path.isdir(staging):
        for name in os.listdir(staging):
            if not name.startswith(trash_prefix + prefix):
                continue
            part_dir = os.path.join(root, name[len(trash_prefix):])
            if not os.path.isdir(part_dir):
                os.rename(os.path.join(staging, name), part_dir)
        shutil.rmtree(staging, ignore_errors=True)
    census: dict[str, int] = {}
    for name in os.listdir(root):
        if not name.startswith(prefix):
            continue
        n = sum(
            1
            for f in os.listdir(os.path.join(root, name))
            if f.endswith(".parquet")
        )
        census[name[len(prefix):]] = n
    todo = sorted(v for v, n in census.items() if n > max_files)
    if not todo:
        return []
    # basePath keeps the partition column visible while scanning ONLY
    # the to-compact partition dirs (partition pruning by path)
    sub = spark.read.option("basePath", root).parquet(
        *[os.path.join(root, prefix + v) for v in todo]
    )
    (
        sub.repartition(F.col(partition_col))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(staging)
    )
    out = []
    for v in todo:
        old = os.path.join(root, prefix + v)
        new = os.path.join(staging, prefix + v)
        # trash slot lives under STAGING, not the table root: a crash
        # here can never leave a '<prefix>...__old' dir that a later
        # census would parse as a ghost partition value
        trash = os.path.join(staging, trash_prefix + prefix + v)
        os.rename(old, trash)
        os.rename(new, old)
        shutil.rmtree(trash)
        after = sum(
            1 for f in os.listdir(old) if f.endswith(".parquet")
        )
        out.append((v, census[v], after))
    shutil.rmtree(staging, ignore_errors=True)
    return out


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Write ``df`` as a Spark BUCKETED catalog table: rows hash-
    partitioned into ``n_buckets`` files by ``key`` at WRITE time (and
    sorted by it within each bucket when ``sort``), with the bucket
    spec recorded in the catalog. Two tables bucketed by their join
    keys with the same bucket count then SortMergeJoin with ZERO
    exchanges — the co-located-join mechanism for 100 TB fact-fact
    joins, where the shuffle (not the join) is the bill: pay the
    partitioning once at ingest, reuse it for every downstream join
    and aggregation on that key (plan-asserted by the q217 pytest).

    Catalog, not path: bucketing metadata lives in the table catalog
    (plain `.parquet(path)` cannot carry it), so this writes via
    saveAsTable into the session warehouse. Callers own table-name
    scoping (q217 uses pid+sf-scoped names so concurrent checkers
    never collide)."""
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").saveAsTable(table)

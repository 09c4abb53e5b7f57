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

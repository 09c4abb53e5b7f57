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
from pyspark.sql import Column

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

"""Exact histogram percentiles over integer-quantized values.

The scale-safe exact-percentile recipe used across the query inventory
(q103/q131/q145/q147/q148; SURVEY.md §2B): quantize the value to an
integer OUTSIDE this helper (cents, day gaps, counts — one IEEE op,
identical on every engine), histogram by exact value per group, run ONE
cumulative window over the HISTOGRAM (bounded by the value range, never
the row count), and decide each percentile with an all-integer threshold
test (cc·den ≥ num·n) — no double ever picks a percentile, so the result
is bit-identical at any parallelism and matches a single-threaded SQL
oracle hash-for-hash.

Contrast `approx_percentile` (q24b): that path trades exactness for a
fixed-size sketch; this one is exact and still never shuffles more than
|groups| × |distinct values| rows.

The reference (song9446/kstreamjs, src/stream.ts:18-271) has no
statistics surface; this operator is part of the engine's analytical
extension.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def histogram_percentiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    percentiles: Mapping[str, tuple[int, int]],
    n_alias: str = "n",
) -> DataFrame:
    """Exact per-group percentiles of an integer column.

    ``df`` holds one row per observation: ``keys`` columns plus
    ``value_col`` (already integer-quantized by the caller).
    ``percentiles`` maps output alias -> (num, den): the alias gets the
    smallest value whose cumulative count satisfies cc*den >= num*n
    (num/den = 1/2 is the exact median, 99/100 the exact p99).

    Returns one row per key combination: ``keys`` + ``n_alias`` (group
    count) + one integer column per requested percentile. With empty
    ``keys`` the result is a single global row (the group-count scalar
    broadcasts; the window degrades to the histogram size, which is why
    the histogram — not the raw rows — must feed it).

    Plan shape: ONE map-combined histogram aggregate off the input, one
    Window node carrying both the cumulative count and the group total
    (two frames over the same partitioning — no second scan of the
    input, no join), then ONE conditional aggregate that extracts every
    requested percentile in a single pass (min(value WHERE cc*den >=
    num*n) per alias). At 100 TB nothing after the first aggregation
    exceeds |groups| x |distinct values| rows.
    """
    keys = list(keys)
    h = df.groupBy(*keys, value_col).agg(F.count(F.lit(1)).alias("__c"))
    part = Window.partitionBy(*keys) if keys else Window.partitionBy()
    cum_w = part.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # The group total is the same window's full-partition frame — the
    # caller's input (often an expensive join/rollup) is scanned once,
    # not once for a count and again for the histogram.
    cn = h.withColumn("__cc", F.sum("__c").over(cum_w)).withColumn(
        n_alias, F.sum("__c").over(part)
    )
    return cn.groupBy(*keys).agg(
        F.first(n_alias).alias(n_alias),
        *[
            F.min(
                F.when(
                    F.col("__cc") * den >= num * F.col(n_alias),
                    F.col(value_col),
                )
            ).alias(alias)
            for alias, (num, den) in percentiles.items()
        ],
    )

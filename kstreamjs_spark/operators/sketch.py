"""Mergeable frequency sketches: Misra-Gries heavy hitters.

The distributed pattern the built-in approximate aggregates (HLL++,
GK — q24b/q50) don't demonstrate: a BOUNDED per-partition summary built
imperatively, merged by plain aggregation, with a PROVABLE error bound.

Misra-Gries(k) guarantees: for every item t,
    true_count - N/(k+1)  <=  estimate(t)  <=  true_count
and every item with true_count > N/(k+1) appears in the summary.
Summaries are mergeable by SUMMING matching counters: each partition's
summary under-counts by at most N_p/(k+1), and the under-counts add, so
the merged estimate keeps the bound with N = Σ N_p (Agarwal et al. 2012,
"Mergeable Summaries", public). The merge is therefore ONE ordinary
groupBy-sum over <= k x partitions rows — no custom reducer needed.

Scale shape: the item stream never leaves its partition (the Arrow
kernel reduces each partition to <= k fixed-width rows); the only
exchange carries the k x P summary rows — constant in data size for
fixed k and parallelism. Determinism: rows are sorted within each
partition before the kernel (hash partitioning + sort is deterministic
for a deterministic input), and the classic decrement-all step has no
data-dependent tie ambiguity.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def misra_gries(
    df: DataFrame,
    col: str,
    k: int = 16,
    sort_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-partition Misra-Gries(k) summaries over ``df[col]`` merged by
    summation: returns (item, est_count) with <= k x partitions rows,
    where est_count is within [true - N/(k+1), true] for the GLOBAL
    count N = total rows. Callers rank/threshold downstream. Pass
    ``sort_cols`` to pin a deterministic in-partition traversal order —
    the bound holds for ANY order, but the exact estimates only
    reproduce if ``sort_cols`` is a TOTAL order over the rows (ties
    leave the traversal to Spark's scan order; q180 adds a posexplode
    position column for exactly this)."""
    src = df.select(col, *sort_cols)
    if sort_cols:
        src = src.sortWithinPartitions(*sort_cols)
    # the summary's item column carries the INPUT column's type — a
    # numeric key must not silently coerce to string at Arrow conversion
    # (phash_blobs' schema-derivation precedent)
    item_type = df.schema[col].dataType.simpleString()

    def summarize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in it:
            for item in pdf[col]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all; drop zeros (the classic MG step)
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "est": list(counters.values())}
            )

    partials = src.mapInPandas(summarize, f"item {item_type}, est long")
    return partials.groupBy("item").agg(
        F.sum("est").cast("long").alias("est_count")
    )

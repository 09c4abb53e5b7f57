"""Hypertable-style multi-resolution time rollup: minute/hour/day
aggregates where each coarser resolution is computed FROM THE FINER
PARTIALS, not from the raw table. The reference has nothing like it; this
is the continuous-aggregate pattern (TimescaleDB hypertables, Druid
rollup) re-expressed in DataFrame algebra.

Scale design (100 TB): the raw table is scanned exactly once at
execution — the static plan duplicates the minute subtree under each
union branch, but AQE exchange reuse collapses them (ReusedExchange,
asserted in tests/test_plans.py); hour and day aggregate the minute
partials — thousands of rows per day instead of billions. Partials are quantized to BIGINT so the
hierarchy is EXACTLY associative: sum(day) == sum over raw, bit-for-bit,
regardless of how the tree is grouped — double partials would drift. In
a real deployment each level is materialized incrementally per window
(the streaming q29 path feeds the minute level; coarser levels are tiny
batch re-aggregations).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

QUANT = 10_000

# date_trunc granularities, finest to coarsest — a coarser level may only
# be computed from a finer one (truncating an hour bucket to 'minute' is
# the identity, so a misordered tuple would silently label hour buckets
# as minutes).
_GRAIN_ORDER = (
    "second", "minute", "hour", "day", "week", "month", "quarter", "year",
)


def time_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    resolutions: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Rollup of SUM(value)/COUNT(*) at each resolution (finest first).
    Output: resolution, bucket_start, sum_value (de-quantized), cnt —
    coarser rows aggregate the finer level's BIGINT partials. Raises on
    a misordered ``resolutions`` tuple instead of silently producing
    wrong finer-level rows."""
    try:
        ranks = [_GRAIN_ORDER.index(r) for r in resolutions]
    except ValueError as e:
        raise ValueError(
            f"unknown resolution in {resolutions!r}; "
            f"expected ones of {_GRAIN_ORDER}"
        ) from e
    if ranks != sorted(ranks) or len(set(ranks)) != len(ranks):
        raise ValueError(
            f"resolutions must be strictly finest-first, got {resolutions!r}"
        )
    # 'week' is finer-grained than 'month' but NOT a refinement of it (or
    # of quarter/year): an ISO week straddling a month boundary would roll
    # its ENTIRE sum into the month of its Monday — silently wrong by up
    # to 6 days of data per boundary. Weeks may be computed FROM daily or
    # finer partials, but nothing coarser may be computed from weeks.
    if "week" in resolutions and resolutions[-1] != "week":
        raise ValueError(
            "'week' buckets straddle month/quarter/year boundaries, so no "
            "coarser resolution can be derived from weekly partials — put "
            "'week' last, or run a separate rollup for calendar grains"
        )
    finest, *coarser = resolutions
    level = df.groupBy(
        F.date_trunc(finest, F.col(ts_col)).alias("bucket_start")
    ).agg(
        F.sum(F.floor(F.col(value_col) * QUANT + 0.5).cast("long")).alias("_q"),
        F.count(F.lit(1)).alias("cnt"),
    )
    out = level.withColumn("resolution", F.lit(finest))
    for res in coarser:
        level = level.groupBy(
            F.date_trunc(res, F.col("bucket_start")).alias("bucket_start")
        ).agg(F.sum("_q").alias("_q"), F.sum("cnt").alias("cnt"))
        out = out.unionByName(level.withColumn("resolution", F.lit(res)))
    return out.select(
        "resolution",
        "bucket_start",
        (F.col("_q") / F.lit(float(QUANT))).alias("sum_value"),
        "cnt",
    )

"""Bounded time-range join: pair each left row with right rows whose
timestamp falls in (left_ts - window, left_ts]. The reference has no joins
(SURVEY.md §2A); this is the events-attribution extension.

Scale design (100 TB): an inequality-only join is planned as a broadcast
nested loop or cartesian product — O(n*m) at any scale. Because the range
is BOUNDED, bucketing both sides by the window width turns it into an
equi-join: a right row at bucket b can only serve left rows in buckets b
or b+1, so the RIGHT (build) side is replicated into those two buckets
(2x fan-out of the build side, not a cross join) while every left row
appears exactly once — which makes `how='left'` exact: one NULL-extended
row iff a left row has no match, never a spurious replica. One shuffle on
(key, bucket); the exact range predicate rides inside the join condition.
The same trick extends to +/-k buckets for windows spanning k widths.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    how: str = "left",
) -> DataFrame:
    """Join right rows with ``left_ts - window < right_ts <= left_ts``,
    matching on ``on``.

    Output: left columns + right's non-key columns. Each valid (left,
    right) pair appears exactly once (a right replica's bucket matches the
    left row's single bucket for exactly one of its two replicas), and
    with how='left' an unmatched left row yields exactly one NULL-extended
    row — exact left-join semantics. The range predicate sits INSIDE the
    join condition: a filter afterwards would drop left rows whose
    candidates all fell outside the range.

    Only LEFT-preserving join types are valid: the right side is
    replicated into two buckets, so a right- or full-preserving join
    would emit each unmatched right row once PER REPLICA (with NULLed
    left keys) — silently duplicated garbage, hence the guard.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"bucketed_range_join supports left-preserving joins only, "
            f"got {how!r}"
        )
    bucket = lambda c: F.floor(F.unix_timestamp(c) / window_seconds)  # noqa: E731
    l = left.withColumn("_rj_b", bucket(F.col(left_ts))).alias("_l")
    r = right.withColumn(
        "_rj_b",
        F.explode(F.array(bucket(F.col(right_ts)), bucket(F.col(right_ts)) + 1)),
    ).alias("_r")
    lc, rc = (lambda c: F.col(f"_l.{c}")), (lambda c: F.col(f"_r.{c}"))
    cond = reduce(
        lambda a, b: a & b,
        [lc(k) == rc(k) for k in on]
        + [
            lc("_rj_b") == rc("_rj_b"),
            rc(right_ts) > lc(left_ts) - F.expr(f"INTERVAL {window_seconds} SECONDS"),
            rc(right_ts) <= lc(left_ts),
        ],
    )
    joined = l.join(r, cond, how)
    right_cols = [c for c in right.columns if c not in on]
    return joined.select(
        *[lc(c).alias(c) for c in left.columns],
        *[rc(c).alias(c) for c in right_cols],
    )

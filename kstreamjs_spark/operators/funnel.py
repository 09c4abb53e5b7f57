"""Ordered-funnel and transition analysis over keyed event sequences.

Not in the reference (its only per-key state is the window buffer,
reference src/stream.ts:130-200); this is the behavioral-analytics layer a
product-events pipeline runs on the same tables the streaming queries
consume. Both operators are single-shuffle by construction:

- :func:`ordered_funnel` collects per-key, per-stage timestamp lists in ONE
  groupBy and evaluates the strict-ordering min-chain
  f1 = min(stage1), f_i = min(stage_i > f_{i-1}) as pure array
  expressions — NULL propagation encodes drop-out, no joins, no sorts
  (min is order-free). Per-key lists are session-sized; cap upstream for
  adversarial keys.
- :func:`transitions` needs one lag window on the key and aggregates to
  the |types|² matrix.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def ordered_funnel(
    df: DataFrame,
    stages: list[str],
    key: str | list[str] = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key strict-event-time funnel over ``stages`` (ordered list of
    ``type_col`` values). ``key`` may be a single column or a composite
    (e.g. ``["user_id", "session_seq"]`` for within-session funnels).
    Returns one row per key with columns ``f1..fn`` — the microsecond
    epoch at which each stage was first reached AFTER the previous one,
    NULL from the first missed stage on.

    Strictness matters: a key whose stage-2 events all precede its first
    stage-1 event does NOT count as reaching stage 2 (co-occurrence
    counting gets this wrong; the unit test pins it)."""
    keys = [key] if isinstance(key, str) else list(key)
    us = F.unix_micros(F.col(ts_col))
    aggs = [
        F.collect_list(F.when(F.col(type_col) == s, us)).alias(f"_ts{i}")
        for i, s in enumerate(stages)
    ]
    u = df.groupBy(*keys).agg(*aggs)

    def chain(prev: Column | None, i: int) -> Column:
        lst = F.col(f"_ts{i}")
        if prev is None:
            return F.array_min(lst)
        return F.array_min(F.filter(lst, lambda x: x > prev))

    out = u
    prev = None
    for i in range(len(stages)):
        out = out.withColumn(f"f{i + 1}", chain(prev, i))
        prev = F.col(f"f{i + 1}")
    return out.select(*keys, *[f"f{i + 1}" for i in range(len(stages))])


def funnel_counts(funnel: DataFrame, n_stages: int) -> DataFrame:
    """Collapse :func:`ordered_funnel` output to per-stage reach counts."""
    return funnel.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        *[
            F.count(f"f{i + 1}").cast("long").alias(f"n_stage{i + 1}")
            for i in range(n_stages)
        ],
    )


def transitions(
    df: DataFrame,
    key: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """First-order transition matrix: (prev, curr, cnt, p) with p
    row-normalized over prev. One lag window on the key; the normalizing
    window runs over the |types|² aggregate."""
    w = Window.partitionBy(key).orderBy(*order_cols)
    s = df.select(
        F.col(type_col).alias("curr"),
        F.lag(type_col).over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    cnt = s.groupBy("prev", "curr").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    total = Window.partitionBy("prev")
    return cnt.withColumn(
        "p", F.round(F.col("cnt") * F.lit(1.0) / F.sum("cnt").over(total), 6)
    )


def with_sessions(
    df: DataFrame,
    gap_s: int = 1800,
    key: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """``df`` plus a ``session_seq`` column: gap-based session ids (q55's
    lag -> flag -> running-sum shape as a reusable operator). ONE shuffle
    on the key serves both window passes, and downstream per-(key,
    session) operators — :func:`ordered_funnel` with a composite key, the
    session rollup — reuse the same clustering."""
    w = Window.partitionBy(key).orderBy(*order_cols)
    lag_ts = F.lag(ts_col).over(w)
    new_s = F.when(
        lag_ts.isNull()
        | (F.unix_timestamp(ts_col) - F.unix_timestamp(lag_ts) > gap_s),
        1,
    ).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )

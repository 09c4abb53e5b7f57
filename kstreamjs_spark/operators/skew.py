"""Skew-handling operators: salted two-phase aggregation and replicated
(broadcast-salted) joins for hot keys.

The reference has no keyed operations at all (no groupBy/join —
reference src/stream.ts:38-90 is map/filter/explode only), so skew never
arises there. At 100 TB it is the #1 shuffle failure mode: one hot key
(a bot user_id, an empty-string normalization artifact) lands a whole
reducer partition on one task. AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin``) handles sort-merge joins automatically,
but (a) skewed *aggregations* whose hot key exceeds one task's memory and
(b) hash-partitioned window functions need explicit salting. These helpers
encode the two standard shapes declaratively so Catalyst still sees plain
groupBy/join plans (partial aggregation, codegen, pushdown all intact).

Salted aggregation = two-phase rewrite, exact for any algebraic aggregate:
  phase 1: groupBy(keys + salt) with the partial forms     (shuffle 1:
           hot key split across `parts` reducers)
  phase 2: groupBy(keys) merging the partials              (shuffle 2:
           tiny — `parts` rows per key)
Supported merges: sum/count/min/max (count merges by summing partial
counts; avg callers compose sum/count). This is exactly Spark's own
partial/final split, made visible so the *reduce* side also splits.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: Sequence[tuple[str, str, str]],
               parts: int = 16) -> DataFrame:
    """Exact groupBy(keys).agg(...) with the hot-key reduce split ``parts``
    ways.

    ``aggs`` is a list of (agg, col, alias) with agg in sum/count/min/max.
    The salt is DETERMINISTIC: pmod(xxhash64(every column), parts). A
    nondeterministic salt (partition id + monotonic id, rand()) recomputes
    DIFFERENTLY when a map stage is re-run after a fetch failure — some
    reducers hold the old bucket assignment and re-fetched ones the new,
    double-counting rows in one bucket and dropping them from another; at
    the 100 TB target where fetch failures are routine that is silent
    corruption, and Spark's indeterminate-stage rollback protects
    repartition(), not user expressions. Content hashing spreads any hot
    key whose rows DIFFER somewhere (the case salting exists for); rows
    identical in every column share a bucket, but those collapse in the
    map-side partial regardless, so no skew survives them.
    """
    for agg, _c, _a in aggs:
        if agg not in _PARTIAL:
            raise ValueError(f"unsupported aggregate for salting: {agg}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(parts)
    ).alias("__salt")
    phase1 = df.groupBy(*keys, salt).agg(*[
        _PARTIAL[agg](c).alias(a) for agg, c, a in aggs
    ])
    return phase1.groupBy(*keys).agg(*[
        _MERGE[agg](a).alias(a) for agg, _c, a in aggs
    ])


def replicated_skew_join(big: DataFrame, small: DataFrame,
                         on: Sequence[str], parts: int = 8,
                         how: str = "inner") -> DataFrame:
    """Equi-join where ``big`` has hot keys: salt big's rows into ``parts``
    buckets and explode ``small`` ×parts so every (key, salt) pair finds
    its match. Exact for any join type where ``small`` is the build side.

    This is the *manual* form of AQE skew-join splitting, needed when the
    small side must broadcast (replication is free: parts × |small|) or
    when running with AQE off (e.g. inside streaming micro-batches, where
    AQE is disabled). The join remains a plain equi-join on
    (on..., __salt) — broadcastable, codegen'd.

    Only join types that preserve/probe the BIG side are valid: a right or
    full join would emit every unmatched ``small`` row once per salt
    replica ('cross' is likewise rejected — with using-columns Spark
    silently degrades it to inner, which is neither cross nor exact).
    The salt is deterministic content hashing (see salted_agg: a
    nondeterministic salt corrupts results under map-stage retry).
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"replicated_skew_join supports big-side-probing joins only, got {how!r}"
        )
    salt_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(parts)),
    )
    salt_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(parts - 1)))
    )
    return (
        salt_big.join(salt_small, [*on, "__salt"], how).drop("__salt")
    )

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


def _salt_hash(df: DataFrame, parts: int,
               salt_cols: Sequence[str] | None):
    """Deterministic content-hash bucket in [0, parts).

    ``xxhash64`` rejects MapType (and anything nesting one) with an
    AnalysisException that surfaces as an opaque Catalyst failure far
    from this call site, so unhashable columns are excluded up front.
    If the caller named a ``salt_cols`` containing one, or no hashable
    column remains, the error is raised HERE with the offending names.
    """
    if salt_cols is not None:
        missing = [c for c in salt_cols if c not in df.columns]
        if missing:
            raise ValueError(f"salt_cols not in DataFrame: {missing}")
        chosen = list(salt_cols)
        bad = [c for c, t in df.dtypes if c in chosen and "map<" in t]
        if bad:
            raise ValueError(
                f"salt_cols contain unhashable (map-typed) columns: {bad}"
            )
    else:
        chosen = [c for c, t in df.dtypes if "map<" not in t]
        if not chosen:
            raise ValueError(
                "no hashable columns to salt on (every column is "
                "map-typed); pass salt_cols naming a derived key"
            )
    return F.pmod(F.xxhash64(*[F.col(c) for c in chosen]), F.lit(parts))


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: Sequence[tuple[str, str, str]],
               parts: int = 16,
               salt_cols: Sequence[str] | None = None) -> DataFrame:
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
    map-side partial regardless, so no skew survives them. Map-typed
    columns are excluded from the hash automatically (xxhash64 rejects
    them); pass ``salt_cols`` to salt on a specific column subset.
    """
    for agg, _c, _a in aggs:
        if agg not in _PARTIAL:
            raise ValueError(f"unsupported aggregate for salting: {agg}")
    salt = _salt_hash(df, parts, salt_cols).alias("__salt")
    phase1 = df.groupBy(*keys, salt).agg(*[
        _PARTIAL[agg](c).alias(a) for agg, c, a in aggs
    ])
    return phase1.groupBy(*keys).agg(*[
        _MERGE[agg](a).alias(a) for agg, _c, a in aggs
    ])


def replicated_skew_join(big: DataFrame, small: DataFrame,
                         on: Sequence[str], parts: int = 8,
                         how: str = "inner",
                         salt_cols: Sequence[str] | None = None) -> DataFrame:
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

    LIMITATION — unlike salted_agg, identical rows do NOT collapse on a
    join probe: big-side rows that are identical in every salted column
    share one bucket, so a hot key whose rows repeat VERBATIM (common in
    denormalized logs) keeps its skew. There is no retry-safe per-row
    disambiguator for byte-identical rows (position-based ids like
    monotonically_increasing_id change across retries — the exact
    corruption the deterministic salt exists to prevent). When big-side
    rows can repeat verbatim, pass ``salt_cols`` naming a stable
    row-identity column materialized upstream (e.g. a persisted
    packing.global_row_ids output); map-typed columns are otherwise
    auto-excluded from the hash (xxhash64 rejects them).
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"replicated_skew_join supports big-side-probing joins only, got {how!r}"
        )
    salt_big = big.withColumn("__salt", _salt_hash(big, parts, salt_cols))
    salt_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(parts - 1)))
    )
    return (
        salt_big.join(salt_small, [*on, "__salt"], how).drop("__salt")
    )

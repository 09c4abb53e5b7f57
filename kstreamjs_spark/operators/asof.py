"""As-of (time-travel) join: for each left row, the most recent right row
with right_ts <= left_ts within the same key — the backbone of
point-in-time feature lookup and event attribution. The reference has no
join at all (SURVEY.md §2A); this is a north-star extension.

Scale design (100 TB): the naive formulations are a range join (O(n*m)
candidate explosion) or a per-row correlated subquery (driver loop). The
implementation here is the scalable idiom: tag both sides, union them,
and run one `last(ignorenulls)` window over (key, time) — a single shuffle
on the key, a sort within each partition, zero row amplification. Skewed
keys are handled by AQE; for a known-hot key, salt the key and merge the
per-salt results with one more window pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    allow_exact_match: bool = True,
) -> DataFrame:
    """Left as-of join.

    Returns ``left``'s columns plus, for each name in ``right_cols``, the
    value from the latest ``right`` row whose ``right_ts`` is <= (or < when
    ``allow_exact_match=False``) the left row's ``left_ts``, matching on the
    ``on`` keys; NULL when no such row exists.

    ``right_ts`` may itself be listed in ``right_cols`` (the common "when
    did it last happen" query).

    The right payload travels as ONE struct column: per-column
    ``last(ignorenulls)`` would fill a NULL field of the matched right row
    from an *earlier* right row, stitching together values that never
    coexisted. A struct is non-NULL even when every field is NULL, so
    ``last`` atomically picks the whole latest row.
    """
    l_tag = left.select(
        *left.columns,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_is_left"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_is_left"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_asof_payload"),
    )
    # allowMissingColumns fills the left rows' _asof_payload with NULL.
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # Right rows sort before left rows at equal timestamps iff ties match.
    tie = F.col("_asof_is_left") if allow_exact_match else -F.col("_asof_is_left")
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts"), tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(
        "_asof_last", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    # getField, not the string path "_asof_last.{c}": a right_cols name
    # containing a dot would otherwise parse as a nested field path.
    return filled.filter(F.col("_asof_is_left") == 1).select(
        *left.columns,
        *[
            F.col("_asof_last").getField(c).alias(f"asof_{c}")
            for c in right_cols
        ],
    )

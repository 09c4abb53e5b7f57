"""As-of (time-travel) join: for each left row, the nearest right row in
time within the same key — backward (most recent at-or-before, the
point-in-time feature lookup), forward (next at-or-after, the
time-to-next-event query), or nearest (whichever is closer). The
reference has no join at all (SURVEY.md §2A); this is a north-star
extension.

Scale design (100 TB): the naive formulations are a range join (O(n*m)
candidate explosion) or a per-row correlated subquery (driver loop). The
implementation here is the scalable idiom: tag both sides, union them,
and run one `last(ignorenulls)` window over (key, time) — a single shuffle
on the key, a sort within each partition, zero row amplification (forward
is a mirrored `first`; nearest runs both passes over the one exchange,
paying a second in-partition sort only). Skewed keys are handled by AQE;
for a
known-hot key, salt the key and merge the per-salt results with one more
window pass.
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
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join.

    Returns ``left``'s columns plus, for each name in ``right_cols``, an
    ``asof_<name>`` column taken from ONE matched right row (NULL when no
    match exists), matching on the ``on`` keys:

    - ``direction="backward"`` (default): the latest right row with
      ``right_ts <= left_ts`` (``<`` when ``allow_exact_match=False``);
    - ``direction="forward"``: the earliest right row with
      ``right_ts >= left_ts`` (``>`` when ``allow_exact_match=False``);
    - ``direction="nearest"``: whichever of the two is closer in absolute
      time; an exact tie prefers the backward match (same convention as
      pandas ``merge_asof``).

    ``right_ts`` may itself be listed in ``right_cols`` (the common "when
    did it last/next happen" query).

    The right payload travels as ONE struct column (with the right
    timestamp alongside, for the nearest comparison): per-column
    ``last(ignorenulls)`` would fill a NULL field of the matched right row
    from an *earlier* right row, stitching together values that never
    coexisted. A struct is non-NULL even when every field is NULL, so
    ``last``/``first`` atomically picks the whole matched row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    l_tag = left.select(
        *left.columns,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_is_left"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_is_left"),
        F.struct(
            F.col(right_ts).alias("_ts"),
            F.struct(*[F.col(c) for c in right_cols]).alias("_row"),
        ).alias("_asof_payload"),
    )
    # allowMissingColumns fills the left rows' _asof_payload with NULL.
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # Tie order decides whether a right row at the SAME timestamp falls
    # inside the window frame. The backward frame ends at the current row,
    # so equal-ts right rows must sort BEFORE the left row to be eligible
    # (AFTER to be excluded when allow_exact_match=False); the forward
    # frame starts at the current row, so eligibility is the mirror
    # image. Hence each side gets its own tiebreak: one shuffle on the
    # key either way, and `nearest` costs a second in-partition sort, not
    # a second exchange.
    is_left = F.col("_asof_is_left")
    tie_back = is_left if allow_exact_match else -is_left
    tie_fwd = -is_left if allow_exact_match else is_left
    # Final tiebreak: the payload struct itself. Without it, two right
    # rows at the SAME (key, timestamp) sort in shuffle-arrival order and
    # last()/first() returns whichever payload happened to land last —
    # run-to-run nondeterminism. Left rows carry a NULL payload and sort
    # together; their relative order is irrelevant (ignorenulls skips
    # them and equal-ts left rows see the same eligible right set).
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts"), tie_back, F.col("_asof_payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts"), tie_fwd, F.col("_asof_payload"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        picked = F.last("_asof_payload", ignorenulls=True).over(w_back)
    elif direction == "forward":
        picked = F.first("_asof_payload", ignorenulls=True).over(w_fwd)
    else:
        back = F.last("_asof_payload", ignorenulls=True).over(w_back)
        fwd = F.first("_asof_payload", ignorenulls=True).over(w_fwd)
        # Distances as exact day-time intervals (timestamp subtraction),
        # never a double cast: the double's ~4e-7 s resolution at current
        # epochs could flip an exact microsecond tie, and the tie rule
        # (prefer backward) must be deterministic. Subtraction (unlike
        # unix_micros, which rejects TIMESTAMP_NTZ) is microsecond-exact
        # for BOTH timestamp flavors and involves no timezone conversion.
        d_back = F.col("_asof_ts") - back.getField("_ts")
        d_fwd = fwd.getField("_ts") - F.col("_asof_ts")
        picked = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(d_back <= d_fwd, back)  # tie -> backward
            .otherwise(fwd)
        )
    filled = u.withColumn("_asof_hit", picked)
    # getField, not a string path: a right_cols name containing a dot
    # would otherwise parse as a nested field path.
    row = F.col("_asof_hit").getField("_row")
    return filled.filter(F.col("_asof_is_left") == 1).select(
        *left.columns,
        *[row.getField(c).alias(f"asof_{c}") for c in right_cols],
    )

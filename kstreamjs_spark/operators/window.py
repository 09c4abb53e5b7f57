"""Window-`collect` adapter: API parity with the reference's arbitrary
window callback (`collect: (msgs: O[]) => N`, /root/reference/src/stream.ts:133,
applied to the whole in-window value list at src/stream.ts:186-198).

Spark-first translation: when the callback is expressible as built-in
aggregates, callers should just use ``groupBy(F.window(...)).agg(...)`` —
that is the fast path (JVM, partial aggregation, codegen). This adapter is
the general path for opaque Python callbacks: ``applyInPandas`` over the
window group, with rows sorted by event time first — the reference hands
the callback values in arrival order, and sorting by (ts, tiebreak) is the
deterministic equivalent (SURVEY.md §7 "hard parts").

Scale note: applyInPandas materializes one (keys x window) group per Arrow
batch. Groups are bounded by the window duration, not the stream length, so
memory is bounded as long as key cardinality per window fits the executor —
the same constraint Spark's own state store has.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def window_collect(
    df: DataFrame,
    ts_col: str,
    duration: str,
    collect: Callable[[pd.DataFrame], dict],
    out_schema: str,
    slide: str | None = None,
    keys: Iterable[str] = (),
    sort_by: Iterable[str] | None = None,
    start_time: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time window + arbitrary Python collect.

    ``collect`` receives the window's rows as a pandas DataFrame sorted by
    ``sort_by`` (default: ts_col) and returns a dict of output columns.
    Output rows carry ``window_start``/``window_end`` plus any ``keys``.
    ``start_time`` offsets the window origin (F.window's startTime) so an
    aligned facade `from_ms` applies to the collect path too.
    """
    keys = list(keys)
    sort_cols = list(sort_by) if sort_by else [ts_col]
    win = F.window(ts_col, duration, slide or duration, start_time) \
        if start_time else (
            F.window(ts_col, duration, slide) if slide
            else F.window(ts_col, duration)
        )
    grouped = df.withColumn("__w", win).groupBy("__w", *keys)

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        res = collect(pdf)
        w = pdf["__w"].iloc[0]
        base = {"window_start": [w["start"]], "window_end": [w["end"]]}
        for k in keys:
            base[k] = [pdf[k].iloc[0]]
        for col, val in res.items():
            base[col] = [val]
        return pd.DataFrame(base)

    full_schema = "window_start timestamp, window_end timestamp"
    for k in keys:
        full_schema += f", {k} {dict(df.dtypes)[k]}"
    full_schema += ", " + out_schema
    return grouped.applyInPandas(apply_fn, full_schema)

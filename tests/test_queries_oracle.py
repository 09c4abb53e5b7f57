"""t2-style correctness: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from kstreamjs_spark.queries import all_queries
from kstreamjs_spark.testing import compare_query, duck_connection

from .conftest import SF_SMOKE

SPECS = all_queries()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, duck, name):
    problems = compare_query(spark, duck, SPECS[name], SF_SMOKE)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_q31_oracle_agrees_with_session_window_at_gap_boundary(spark):
    """The registry's q31 oracle text vs F.session_window on rows whose
    per-user deltas sit AT the 30-minute boundary (1799/1800/1801 s) —
    the case the test corpus never produces (zero exact-1800 deltas at
    sf0.01 and sf0.1, checked). session_window merges the exactly-at-gap
    event; an oracle saying >= instead of > diverges only here."""
    import duckdb
    import pandas as pd
    import pyspark.sql.functions as F

    rows = []
    eid = 0
    for u, deltas in enumerate([
        [1799],                 # merge
        [1800],                 # merge — THE boundary case
        [1801],                 # split
        [1800, 1800, 1801],     # chain of merges then a split
        [0, 1800, 3600],        # tie, boundary, far
    ]):
        t = 1_700_000_000
        rows.append((u, t, 0.25, eid)); eid += 1
        for d in deltas:
            t += d
            rows.append((u, t, 0.25, eid)); eid += 1
    sdf = spark.createDataFrame(
        rows, "user_id long, epoch long, value double, event_id long"
    ).select("user_id", F.timestamp_seconds("epoch").alias("ts"),
             "value", "event_id")
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["cnt"],
         r["sum_value"])
        for r in (
            sdf.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                (F.sum(F.floor(F.col("value") * 10000 + 0.5).cast("long"))
                 / 10000.0).alias("sum_value"),
            )
            .select("user_id",
                    F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "cnt", "sum_value")
            .collect()
        )
    }
    con = duckdb.connect()
    pdf = pd.DataFrame(
        rows, columns=["user_id", "epoch", "value", "event_id"]
    )
    pdf["ts"] = pd.to_datetime(pdf["epoch"], unit="s")
    con.register("events", pdf[["user_id", "ts", "value", "event_id"]])
    want = {
        (r[0], r[1], r[2], r[3], float(r[4]))
        for r in con.sql(SPECS["q31_session_windows"].oracle).fetchall()
    }
    con.close()
    assert got == want

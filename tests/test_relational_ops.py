

def test_histogram_percentiles_exact_small(spark):
    """The histogram-percentile operator matches the brute-force sorted
    definition (smallest v with rank*den >= num*n) per group, including
    the empty-keys global form."""
    import pyspark.sql.functions as F
    from kstreamjs_spark.operators.percentile import histogram_percentiles

    rows = [("a", v) for v in [1, 2, 2, 3, 100]] + [
        ("b", v) for v in [10, 20, 30, 40]
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {
        r["g"]: r
        for r in histogram_percentiles(
            df, ["g"], "v", {"p50": (1, 2), "p75": (3, 4)}
        ).collect()
    }
    # a: n=5 -> p50 at rank>=2.5 -> 3rd smallest=2; p75 at rank>=3.75 -> 4th=3
    assert (out["a"]["n"], out["a"]["p50"], out["a"]["p75"]) == (5, 2, 3)
    # b: n=4 -> p50 at rank>=2 -> 20; p75 at rank>=3 -> 30
    assert (out["b"]["n"], out["b"]["p50"], out["b"]["p75"]) == (4, 20, 30)
    g = histogram_percentiles(
        df.select("v"), [], "v", {"p50": (1, 2)}, n_alias="cnt"
    ).collect()
    # global: sorted 1,2,2,3,10,20,30,40,100; n=9 -> p50 at rank>=4.5 -> 10
    assert len(g) == 1 and g[0]["cnt"] == 9 and g[0]["p50"] == 10


def test_operator_guards_reject_unsound_join_types(spark):
    """The replica-based joins must refuse join types their replication
    breaks: rangejoin duplicates unmatched right rows per bucket replica,
    and skew-join 'cross' silently degrades to inner under using-columns."""
    from datetime import datetime

    import pytest

    from kstreamjs_spark.operators.rangejoin import bucketed_range_join
    from kstreamjs_spark.operators.rollup_time import time_rollup
    from kstreamjs_spark.operators.skew import replicated_skew_join

    l = spark.createDataFrame(
        [("u", datetime(2024, 1, 1), 1)], ["k", "lts", "lid"]
    )
    r = spark.createDataFrame(
        [("u", datetime(2024, 1, 1), 9)], ["k", "rts", "rid"]
    )
    with pytest.raises(ValueError, match="left-preserving"):
        bucketed_range_join(l, r, ["k"], "lts", "rts", 3600, how="right")
    with pytest.raises(ValueError, match="big-side-probing"):
        replicated_skew_join(l, r.select("k", "rid"), ["k"], how="cross")
    with pytest.raises(ValueError, match="finest-first"):
        time_rollup(l, "lts", "lid", resolutions=("hour", "minute"))


def test_asof_payload_tiebreak_deterministic(spark):
    """Two right rows at the same (key, ts) must resolve to ONE payload
    regardless of input partitioning — before the payload tiebreak the
    winner was shuffle-arrival order."""
    from datetime import datetime

    from kstreamjs_spark.operators.asof import asof_join

    t = datetime(2024, 1, 1, 10, 0)
    left = spark.createDataFrame([("u", t)], ["k", "lts"])
    rows = [("u", t, 1.0), ("u", t, 2.0)]
    outs = set()
    for parts in (1, 7):
        right = spark.createDataFrame(rows, ["k", "rts", "px"]).repartition(
            parts
        )
        out = asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_cols=["px"],
        ).collect()
        outs.add(out[0]["asof_px"])
    assert len(outs) == 1, outs


def test_time_rollup_rejects_coarser_than_week(spark):
    """A week straddling a month boundary would roll its whole sum into
    the month of its Monday (e.g. Jan 29 2024 starts a week that spans
    into February) — deriving ANY calendar grain from weekly partials is
    silently wrong, so the operator refuses; week-last is fine."""
    from datetime import datetime

    import pytest

    from kstreamjs_spark.operators.rollup_time import time_rollup

    df = spark.createDataFrame(
        [(datetime(2024, 1, 29), 1.0), (datetime(2024, 2, 2), 1.0)],
        ["ts", "v"],
    )
    with pytest.raises(ValueError, match="straddle"):
        time_rollup(df, "ts", "v", resolutions=("day", "week", "month"))
    out = time_rollup(df, "ts", "v", resolutions=("day", "week"))
    rows = {
        (r["resolution"], str(r["bucket_start"])): r["sum_value"]
        for r in out.collect()
    }
    # both days land in the SAME ISO week (Mon Jan 29 .. Sun Feb 4)
    assert rows[("week", "2024-01-29 00:00:00")] == 2.0

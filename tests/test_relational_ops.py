

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

"""End-to-end warehouse-analytics session: the classic star-schema
shapes the query inventory proves one-by-one (SURVEY.md §2B), composed
the way a BI/finance run actually uses them:

  1. revenue rollup      nation-level revenue through the broadcast
                         region->nation->customer dim chain (TPC-H Q5)
  2. fulfilment audit    late-shipment counts per order priority
                         (TPC-H Q12, timestamp-preserving interval math)
  3. bulk buyers         orders over 250 units, HAVING before any join
                         (TPC-H Q18 — survivors broadcast at runtime)
  4. segment economics   exact p50/p90 customer lifetime value per
                         market segment (cent-quantized histogram
                         percentiles — operators/percentile.py)

Every number that crosses an aggregation is an exact integer (cents /
revenue quanta); doubles appear only in final per-row divisions, so the
results are bit-identical at any parallelism.

Run:  python examples/warehouse_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from kstreamjs_spark.operators.percentile import histogram_percentiles  # noqa: E402
from kstreamjs_spark.plans import broadcast_if_small  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    spark = get_spark("warehouse-analytics", cpus=4, shuffle_partitions=4)
    t = {
        name: spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for name in ("region", "nation", "customer", "orders", "lineitem")
    }
    revq = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")

    # 1. Revenue by nation: dims collapse into one broadcast build side;
    #    revenue sums as exact int64 quanta (order-free).
    dims = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"]),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    rev = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            broadcast_if_small(dims, gate=t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("n_name")
        .agg((F.sum(revq) / 10000.0).alias("revenue"))
    )
    top = rev.orderBy(F.desc("revenue")).limit(3).collect()
    print(f"top nations by revenue: {[(r['n_name'], round(r['revenue'])) for r in top]}")

    # 2. Late-shipment audit: interval arithmetic keeps engine semantics
    #    exact for non-midnight order timestamps too.
    late = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("late_lines"))
    )
    n_late = late.agg(F.sum("late_lines")).collect()[0][0] or 0
    print(f"late lines (>90d): {n_late}")

    # 3. Bulk buyers: the quantity HAVING runs before any join, so only
    #    the rare survivors ever meet the orders fact.
    bulk = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.floor(F.col("l_quantity") * 100 + 0.5).cast("long")).alias(
                "tq"
            )
        )
        .filter(F.col("tq") > 250 * 100)
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
    )
    print(f"bulk orders (>250 units): {bulk.count()}")

    # 4. Segment LTV percentiles: cent totals per customer, then the
    #    exact histogram-percentile operator per market segment.
    ltv = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("ltv_c")
        )
    )
    pct = histogram_percentiles(
        ltv, ["segment"], "ltv_c", {"p50": (1, 2), "p90": (9, 10)}
    ).select(
        "segment",
        "n",
        (F.col("p50") / 100.0).alias("p50_ltv"),
        (F.col("p90") / 100.0).alias("p90_ltv"),
    )
    for r in pct.orderBy("segment").collect():
        print(
            f"  {r['segment']}: n={r['n']} "
            f"p50=${r['p50_ltv']:,.0f} p90=${r['p90_ltv']:,.0f}"
        )

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:2]))

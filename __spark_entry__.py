"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (SURVEY.md §7 minimum slice) at sf0.001.
queries()      — every implemented query from SURVEY.md §2B, by name.
oracle_sql()   — DuckDB-equivalent SQL for the hash-matched subset.

Implementation lives in kstreamjs_spark/queries/ (one QuerySpec per
capability, Spark callable + oracle side by side).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hourly revenue of purchase events over sf0.001 — scan ->
    pushed filter -> event-time tumbling window agg (the reference's whole
    semantic core in one query, SURVEY.md §7 step 2)."""
    from kstreamjs_spark.tables import load

    (events,) = load(spark, "/root/testdata/sf0.001", "events")
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("hour")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kstreamjs_spark.queries import all_queries

    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from kstreamjs_spark.queries import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }

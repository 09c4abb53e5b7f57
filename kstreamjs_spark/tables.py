"""Test-table registry for the driver-generated parquet (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table per scale factor.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import configure_runtime

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that are always broadcast-eligible at any scale
# (region=5 rows, nation=25 rows at every SF; at 100 TB these stay tiny).
BROADCAST_DIMS = frozenset({"region", "nation"})


def fix_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize ``events.ts`` to TIMESTAMP regardless of how the driver's
    generator wrote it — the writer has changed between rounds:

    - TIMESTAMP(NANOS): Spark reads long-ns (legacy.parquet.nanosAsLong);
      convert with integer division (ns epochs exceed double precision —
      never use `/`), truncating exactly like DuckDB's ns->us read path.
    - timestamp[us] without isAdjustedToUTC: Spark infers TIMESTAMP_NTZ,
      which streaming watermarks (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and
      several chrono functions reject; cast to TIMESTAMP — the session
      timezone is pinned to UTC (session.configure_runtime), so the
      wall-clock values are bit-identical to what DuckDB reads.
    """
    dt = dict(df.dtypes).get(ts_col)
    if dt == "bigint":
        df = df.withColumn(ts_col, F.expr(f"timestamp_micros({ts_col} div 1000)"))
    elif dt == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load the named tables from ``sf_dir`` as DataFrames.

    Column pruning and predicate pushdown reach the parquet scan because we
    return the raw ``spark.read.parquet`` plan — callers select/filter on it
    declaratively and Catalyst pushes both into the scan.
    """
    configure_runtime(spark)
    out = []
    for n in names:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        if n == "events":
            df = fix_event_time(df)
        out.append(df)
    return out


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return dict(zip(TABLES, load(spark, sf_dir, *TABLES)))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL surface)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)

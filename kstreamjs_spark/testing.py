"""Shared correctness-compare harness: mirrors the driver's gate (row count
+ column names + order-insensitive canonical values) between a Spark query
result and its DuckDB oracle.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from .tables import TABLES


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 10))
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(norm_cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return norm_cell(v.item())
    except ImportError:  # pragma: no cover
        pass
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(spark, con, spec, sf_dir: str) -> list[str]:
    """Run one QuerySpec both ways; return a list of problems (empty=pass).
    Rows-only specs (oracle=None) only assert the Spark side runs."""
    df = spec.fn(spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    if spec.oracle is None:
        return []
    cur = con.execute(spec.oracle)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()
    problems: list[str] = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(
            f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        )
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
    if not problems:
        a = canon(spark_rows, spark_cols)
        b = canon(duck_rows, duck_cols)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            problems.append(f"values differ, first diffs: {diffs}")
    return problems

"""Declared query inventory (SURVEY.md §2B) with DuckDB oracles.

Every capability the engine claims is a named ``QuerySpec``: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent ANSI SQL the driver runs through DuckDB on the same parquet.
Column names are aliased identically on both sides — the driver's compare
sorts columns by name before hashing values.

Determinism rules used throughout (SURVEY.md §7 "hard parts"):
- row-level arithmetic on doubles is left unrounded (IEEE ops are bitwise
  identical across engines);
- aggregated doubles (SUM/AVG over many rows: summation order differs
  between engines) are rounded to a precision far above the fp error bound;
- integer-producing scalar functions are cast to BIGINT on the Spark side to
  match DuckDB's default integer width;
- every LIMIT query carries a total order (unique tiebreak column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the registered views, or None
    tags: tuple[str, ...] = ()
    bench: bool = False  # part of the headline bench set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (),
          bench: bool = False):
    """Decorator registering a query implementation."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules once, on first use.
    from . import relational  # noqa: F401
    from . import llm  # noqa: F401
    from . import streaming_q  # noqa: F401
    from . import pipeline  # noqa: F401
    return dict(REGISTRY)

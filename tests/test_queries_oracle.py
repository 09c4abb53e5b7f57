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

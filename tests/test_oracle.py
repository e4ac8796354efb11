"""DuckDB-oracle equivalence for every registered query (SURVEY.md §5.1).

Runs at sf0.001 for speed; scripts/check_oracle.py runs the same compare
at sf0.01 (the driver's scale). Each query is its own parametrized case so
a failure names the operator.
"""

from __future__ import annotations

import pytest

from amazonbigdata_for_students_spark.plans import REGISTRY
from amazonbigdata_for_students_spark.testing import compare_query, duckdb_connect

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_SMALL)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, name):
    res = compare_query(spark, REGISTRY[name], SF_SMALL, con)
    assert res.ok, f"{name}: {res.detail}"

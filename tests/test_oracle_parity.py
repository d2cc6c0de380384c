"""Every registered query must match its DuckDB oracle at sf0.001.

This is a local mirror of the driver's correctness gate (the driver
runs the same comparison at sf0.01 and records CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import pytest

import dwh_spark.plans.all  # noqa: F401
from dwh_spark.plans.registry import ORACLES, QUERIES
from tests.conftest import SF_SMALL
from tests.oracle_harness import compare, duckdb_connection


@pytest.fixture(scope="module")
def con():
    con = duckdb_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    df = QUERIES[name](spark, SF_SMALL)
    if name in ORACLES:
        compare(df, con, ORACLES[name], name)
    else:
        # rows-only check (non-SQL-expressible operator)
        assert df.count() >= 0


def test_every_query_has_oracle_or_is_flagged():
    missing = sorted(set(QUERIES) - set(ORACLES))
    # Keep the list of rows-only queries deliberate and small.
    allowed_rows_only = set()
    assert set(missing) <= allowed_rows_only, f"queries without oracle: {missing}"

"""Every registered query with an oracle must hash-match DuckDB.

Runs at sf0.001 for speed in the dev loop; the driver repeats the
same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from ccgp_data_wrangling_spark.queries import all_oracles, all_queries
from tests.conftest import SF_SMOKE
from tests.oracle import compare, duck_connection


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_SMOKE)
    yield c
    c.close()


def _oracle_cases():
    oracles = all_oracles()
    return sorted(oracles.keys())


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(spark, con, name):
    fn = all_queries()[name]
    sql = all_oracles()[name]
    compare(fn(spark, SF_SMOKE), con, sql)


def test_all_queries_run_smoke(spark):
    """Queries without an oracle still must run and return a schema."""
    oracles = all_oracles()
    for name, fn in all_queries().items():
        if name in oracles:
            continue
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        assert df.count() >= 0, name

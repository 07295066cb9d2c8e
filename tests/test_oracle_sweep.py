"""Differential gate: every registry query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from datalake_polygonscan_spark.queries import REGISTRY

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duckdb_conn


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, con):
    ok, msg = compare(name, spark, con, SF_SMOKE)
    assert ok, f"{name}: {msg}"

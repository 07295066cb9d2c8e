"""connected_components (operators/graph.py)."""

from __future__ import annotations

import pytest

from datalake_polygonscan_spark.operators.graph import connected_components


def _comp(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.node: r.comp for r in connected_components(df, "src", "dst").collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter > 1, needs multiple propagation rounds
    got = _comp(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_multiple_components_and_direction_independence(spark):
    got = _comp(spark, [(9, 2), (2, 7), (10, 11), (30, 30)])
    assert got == {2: 2, 7: 2, 9: 2, 10: 10, 11: 10, 30: 30}


def test_star_and_cycle(spark):
    got = _comp(spark, [(5, 1), (5, 2), (5, 3), (6, 7), (7, 8), (8, 6)])
    assert got[1] == got[2] == got[3] == got[5] == 1
    assert got[6] == got[7] == got[8] == 6


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, "src", "dst", max_iter=1)

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


# ---------------------------------------------------------------------------
# G2 PageRank (operators/graph.py:pagerank)
# ---------------------------------------------------------------------------


def test_pagerank_mass_conserved_without_dangling(spark):
    """Every node has out-edges -> total rank mass stays 1 (up to the
    per-iteration 1e-12 quantization)."""
    from datalake_polygonscan_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 1), (0, 2)], ["src", "dst"]
    )
    ranks = pagerank(edges, n_iter=10)
    total = sum(r["rank"] for r in ranks.collect())
    assert abs(total - 1.0) < 1e-9


def test_pagerank_ordering_on_star_graph(spark):
    """A hub every spoke points at must out-rank the spokes."""
    from datalake_polygonscan_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(0, 1)], ["src", "dst"]
    )
    r = {row["node"]: row["rank"] for row in pagerank(edges, n_iter=10).collect()}
    assert r[0] > max(r[i] for i in range(2, 6))
    assert r[1] > r[2]  # the hub's sole out-link concentrates on node 1


def test_pagerank_deterministic_across_partitionings(spark):
    """Exact-decimal contribution sums: bit-identical ranks whatever
    the edge partitioning — the reproducibility contract."""
    import random

    from datalake_polygonscan_spark.operators.graph import pagerank

    rng = random.Random(9)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(150)})
    e1 = spark.createDataFrame(pairs, ["src", "dst"]).repartition(13)
    e2 = spark.createDataFrame(list(reversed(pairs)), ["src", "dst"]).repartition(2)
    r1 = sorted((r["node"], r["rank"]) for r in pagerank(e1, n_iter=5).collect())
    r2 = sorted((r["node"], r["rank"]) for r in pagerank(e2, n_iter=5).collect())
    assert r1 == r2


def test_bfs_hops_exact_distances_and_unreachable(spark):
    """G6: hand-built graph — path 0-1-2-3, a shortcut 0-4-3 does not
    shorten below the true min, node 9 unreachable, frontier stops at
    the first empty level."""
    from pyspark.sql import functions as F

    from datalake_polygonscan_spark.operators.graph import bfs_hops

    pairs = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3), (7, 9)]
    fwd = spark.createDataFrame(pairs, "src long, dst long")
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = {r.node: r.dist for r in bfs_hops(edges, source=0, max_iter=10).collect()}
    assert got == {0: 0, 1: 1, 4: 1, 2: 2, 3: 2}
    # 7 and 9 are in another component: absent from dist entirely
    assert 7 not in got and 9 not in got


def test_personalized_pagerank_zero_on_unreachable(spark):
    """The property that distinguishes PPR from global PageRank: mass
    only flows FROM the teleport set, so a component not reachable
    from any seed scores exactly 0.0 — preserved because the teleport
    base is exactly 0 there and contributions sum exact decimals."""
    from pyspark.sql import functions as F

    from datalake_polygonscan_spark.operators.graph import pagerank

    # two components: {0,1,2} (seeded) and {10,11} (unreachable)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    ranks = {r["node"]: r["rank"] for r in
             pagerank(edges, n_iter=4, teleport_nodes=seeds).collect()}
    assert ranks[10] == 0.0 and ranks[11] == 0.0
    # the whole seed component carries positive mass
    assert ranks[0] > 0 and ranks[1] > 0 and ranks[2] > 0
    # the cycle has no dangling nodes, so mass is conserved exactly
    # (up to the per-step 1e-12 rounding)
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_k_core_peels_pendant_path_cascade(spark):
    """A triangle with a 4-node pendant path: the 2-core is exactly the
    triangle, reached only after the path peels one node per round
    (the cascade a single-pass degree filter gets wrong)."""
    from datalake_polygonscan_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0),           # triangle = the 2-core
         (0, 10), (10, 11), (11, 12), (12, 13)],  # pendant path
        "src long, dst long",
    )
    core = {r["node"]: r["core_deg"] for r in k_core(edges, k=2).collect()}
    assert core == {0: 2, 1: 2, 2: 2}


def test_k_core_empty_when_k_exceeds_degeneracy(spark):
    from datalake_polygonscan_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    assert k_core(edges, k=3).count() == 0


def test_k_core_matches_networkx_style_recompute(spark):
    """Cross-validate against an independent pure-Python peeling over
    the same derived graph."""
    import collections

    from datalake_polygonscan_spark.operators.graph import k_core

    rows = [(i * 13 % 40, i * 7 % 40) for i in range(200)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {r["node"]: r["core_deg"] for r in k_core(edges, k=3).collect()}

    adj = collections.defaultdict(set)
    for a, b in rows:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    alive = set(adj)
    while True:
        weak = {n for n in alive if sum(1 for m in adj[n] if m in alive) < 3}
        if not weak:
            break
        alive -= weak
    want = {n: sum(1 for m in adj[n] if m in alive) for n in alive}
    assert got == want

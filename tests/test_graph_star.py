"""G7 alternating-star connected components + G8 weighted SSSP.

The star algorithm's contract is EXACTLY connected_components' —
(node, comp=component-min) — so equality on seeded random graphs is
the strongest check available: both iterative algorithms must land on
identical fixpoints from very different round structures. The chain
test locks the reason G7 exists: convergence within O(log diameter)
alternations on a graph where min-label propagation needs a round per
hop. SSSP cross-validates against a driver-side Dijkstra oracle.
"""

from __future__ import annotations

import heapq
import random

import pytest

from datalake_polygonscan_spark.operators.graph import (
    connected_components,
    connected_components_star,
    sssp,
)


def _cc(pairs):
    """Driver-side union-find ground truth."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 40, 30), (2, 80, 120), (3, 200, 160)])
def test_star_cc_matches_minlabel_and_union_find(spark, seed, n_nodes, n_edges):
    rnd = random.Random(seed)
    pairs = []
    while len(pairs) < n_edges:
        a, b = rnd.randrange(n_nodes), rnd.randrange(n_nodes)
        if a != b:
            pairs.append((a, b))
    e = spark.createDataFrame(pairs, "src long, dst long")
    star = {r["node"]: r["comp"] for r in connected_components_star(e).collect()}
    label = {r["node"]: r["comp"] for r in connected_components(e).collect()}
    truth = _cc(pairs)
    assert star == label == truth


def test_star_cc_chain_converges_in_log_rounds(spark):
    """3 chains of 200 nodes: diameter 200 means ~200 min-label rounds,
    but the star alternation must settle within 12 — passing with
    max_rounds=12 IS the O(log n) bound assertion."""
    chain = [(i, i + 3) for i in range(0, 600 - 3)]
    e = spark.createDataFrame(chain, "src long, dst long")
    comp = connected_components_star(e, max_rounds=12).collect()
    sizes: dict[int, int] = {}
    for r in comp:
        sizes[r["comp"]] = sizes.get(r["comp"], 0) + 1
    assert sizes == {0: 200, 1: 200, 2: 200}


def test_star_cc_handles_self_loops_and_duplicates(spark):
    e = spark.createDataFrame(
        [(5, 5), (1, 2), (2, 1), (1, 2), (7, 8)], "src long, dst long"
    )
    comp = {r["node"]: r["comp"] for r in connected_components_star(e).collect()}
    # the pure self-loop node disappears after self-edge filtering;
    # real pairs resolve to component minimums
    assert comp == {1: 1, 2: 1, 7: 7, 8: 7}


def _dijkstra(adj, source):
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


@pytest.mark.parametrize("seed", [11, 12])
def test_sssp_matches_dijkstra(spark, seed):
    rnd = random.Random(seed)
    edges = []
    for _ in range(300):
        a, b = rnd.randrange(80), rnd.randrange(80)
        if a != b:
            w = rnd.randrange(1, 10)
            edges.append((a, b, w))
            edges.append((b, a, w))
    adj: dict[int, list[tuple[int, int]]] = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r["node"]: r["dist"] for r in sssp(e, source=0).collect()}
    assert got == _dijkstra(adj, 0)


def test_sssp_prefers_cheap_multi_hop_over_direct_edge(spark):
    # direct 0->3 costs 50; the 3-hop path costs 3 — a hop-count BFS
    # would pick the direct edge, SSSP must not
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 50)]
    edges += [(b, a, w) for a, b, w in edges]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r["node"]: r["dist"] for r in sssp(e, source=0).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}

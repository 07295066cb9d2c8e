"""Iterative graph operators: connected components over pair edges.

``connected_components`` turns a duplicate-PAIR relation (e.g. the
verified MinHash-LSH pairs) into duplicate GROUPS: every node gets the
minimum node id reachable from it — the transitive closure the
pairwise dedup deliberately skips.

Spark-first formulation: min-label propagation on the node table.
Each round joins the symmetric edge list to the current labels,
takes the per-node min over neighbor labels, and stops when no label
changed. Convergence is bounded by the graph diameter; dedup graphs
are unions of near-cliques (LSH bands link most pair members
directly), so 3-5 rounds settle real corpora.

Scale notes (the 100 TB story):
- Each round is one shuffle join (edges ⋈ labels on the neighbor key)
  + one partial-aggregating groupBy — both on the node id key, so AQE
  can reuse the partitioning; no all-pairs anything.
- ``localCheckpoint`` truncates the growing lineage each round
  (iterative DataFrame plans otherwise re-analyze O(rounds²)); on a
  real cluster use reliable ``checkpoint`` to survive executor loss.
- Convergence detection is FOLDED into the propagation pass: labels
  only ever decrease, so "changed" is ``new_comp < comp`` computed in
  the same projection, and the per-round driver scalar is one
  ``max(_changed)`` aggregate over the just-checkpointed result — no
  extra join, no second pass over the edges.
- For adversarial long-chain graphs (diameter ~ n), swap the body for
  alternating large-star/small-star (Kiveris et al., O(log n)
  rounds); corpus dedup does not need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datalake_polygonscan_spark.tables import tiny_df


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id in the node's connected component.
    Deterministic; raises if ``max_iter`` rounds don't converge."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)
    comp = sym.select(F.col("a").alias("node")).distinct().withColumn("comp", F.col("node"))
    for _ in range(max_iter):
        nbr_min = (
            sym.join(comp, sym["b"] == comp["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_comp = F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp")))
        # labels are monotone non-increasing, so "changed" folds into
        # the propagation projection itself (no compare-join afterward)
        new = (
            comp.join(nbr_min, "node", "left")
            .select("node", new_comp.alias("comp"), (new_comp < F.col("comp")).alias("_changed"))
            .localCheckpoint(eager=True)
        )
        changed = new.agg(F.max("_changed").alias("any")).collect()[0]["any"]
        comp = new.drop("_changed")
        if not changed:
            return comp
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """G3 — per-node triangle participation counts via DEGREE-ORDERED
    orientation (the distributed-triangle standard: orient each
    undirected edge from its lower-(degree, id) endpoint to the higher
    one, enumerate wedges only at each edge's lower endpoint, close
    them with one semi-join). Returns (node, deg, n_tri).

    Scale notes (the 100 TB story):
    - Naive wedge enumeration fans out by Σ deg(v)² — a single hub
      node with 10M neighbors generates 10¹⁴ wedges. Orientation by
      (degree, id) caps every node's OUT-degree at O(√m), so the
      wedge join is O(m^{3/2}) TOTAL regardless of skew — hubs become
      wedge *targets*, never wedge *pivots* (Suri & Vassilvitskii,
      WWW'11).
    - Two shuffle joins on node keys: wedges (oriented ⋈ oriented on
      the pivot) and closure (wedges ⋈ oriented on the far pair);
      both partial-aggregate before the per-node count.
    - Output is exact (no sampling); counts are integers so the sum
      is order-insensitive under any partitioning.
    """
    a, b = F.col(src), F.col(dst)
    canon = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
        .localCheckpoint(eager=True)
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    ori = (
        canon.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
        .localCheckpoint(eager=True)
    )
    e1 = ori.select(F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("dv1"))
    e2 = ori.select(F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("dv2"))
    wedges = e1.join(e2, "u").filter(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2")))
    )
    closer = ori.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedges.join(closer, ["v1", "v2"]).select("u", "v1", "v2")
    per_node = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("v1").alias("node")))
        .unionByName(tri.select(F.col("v2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_tri"))
    )
    return deg.join(per_node, "node", "left").select(
        "node", "deg", F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri")
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    teleport_nodes: DataFrame | None = None,
) -> DataFrame:
    """G2 — PageRank with EXACT-DECIMAL contribution sums: per edge,
    contrib = round(rank_src/outdeg_src, 12) cast to DECIMAL(28,12),
    summed exactly per destination — a float sum over a shuffled edge
    list is order-dependent and would not reproduce across cluster
    sizes; the decimal sum is bit-identical under any partitioning
    (the same determinism contract as operators/regression.py), which
    is what lets a SQL oracle replay the whole iteration loop.

    One join per iteration (edges ⋈ ranks on src, both hash-partitioned
    on the node key — the exchange is reused), one partial-aggregated
    sum per destination, one left join back to the node set (nodes
    with no in-links keep the teleport mass); ranks are
    localCheckpoint'd per iteration so the plan stays one-iteration
    deep. Dangling nodes (no out-edges) leak their mass — the
    classic simplification; both engines leak identically.

    G9 — ``teleport_nodes`` turns this into PERSONALIZED PageRank
    (the recommendation / trust-propagation form): the (1-d) teleport
    mass concentrates uniformly on that node set instead of the whole
    graph, and ranks seed from it, so scores measure proximity TO THE
    SEED SET rather than global centrality. Same per-iteration shape
    — the personalization is one extra left-join flag on the node
    table, materialized once.
    """
    # materialize the loop-invariant sides once (localCheckpoint):
    # without it every iteration re-derives the edge list, node set
    # and out-degrees from scratch — 5 iterations = 5 re-scans of the
    # upstream plan (at corpus scale these are staged tables)
    edges = edges.select(F.col(src).alias(src), F.col(dst).alias(dst)).localCheckpoint(
        eager=True
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    outdeg = (
        edges.groupBy(F.col(src).alias("node"))
        .agg(F.count("*").alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    if teleport_nodes is None:
        nodes = nodes.withColumn("_base", F.lit((1 - damping) / n))
        ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    else:
        seeds = teleport_nodes.select(F.col(teleport_nodes.columns[0]).alias("node")).distinct()
        n_seeds = seeds.count()
        if n_seeds == 0:
            raise ValueError("personalized PageRank needs a non-empty teleport set")
        nodes = (
            nodes.join(seeds.withColumn("_s", F.lit(True)), "node", "left")
            .select(
                "node",
                F.when(F.col("_s"), F.lit((1 - damping) / n_seeds))
                .otherwise(F.lit(0.0))
                .alias("_base"),
            )
            .localCheckpoint(eager=True)
        )
        ranks = nodes.select(
            "node",
            F.when(F.col("_base") > 0, F.lit(1.0 / n_seeds)).otherwise(F.lit(0.0)).alias("rank"),
        )
    for _ in range(n_iter):
        contribs = (
            edges.select(F.col(src).alias("node"), F.col(dst).alias("_dst"))
            .join(ranks, "node")
            .join(outdeg, "node")
            .select(
                F.col("_dst").alias("node"),
                F.round(F.col("rank") / F.col("outdeg"), 12).cast("decimal(28,12)").alias("c"),
            )
        )
        sums = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                F.round(
                    F.col("_base")
                    + F.lit(damping) * F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                    12,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def label_propagation(
    edges: DataFrame,
    n_rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """G5 — synchronous label-propagation community detection with a
    DETERMINISTIC tie-break: every round, each node adopts the most
    frequent label among its neighbors, ties resolved to the SMALLEST
    label; a fixed round count (no data-dependent stopping) keeps the
    run replayable by a SQL oracle round-for-round.

    Scale notes (the 100 TB story):
    - One shuffle join (symmetric edges ⋈ labels on the neighbor key)
      + one (node, label) partial-agg count + one per-node argmax per
      round — the same per-round cost envelope as PageRank; no
      all-pairs stage, hub nodes cost their degree, nothing more.
    - The argmax is max(struct(cnt, -label)) — a single aggregate,
      order-insensitive under any partitioning (counts are integers),
      so distributed determinism needs no decimal contract here.
    - localCheckpoint per round truncates the iterative lineage.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)
    nodes = sym.select(F.col("a").alias("node")).distinct().localCheckpoint(eager=True)
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(n_rounds):
        nbr = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        best = nbr.groupBy("node").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m")
        ).select("node", (-F.col("m.neg")).alias("new_label"))
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce("new_label", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def bfs_hops(
    edges: DataFrame,
    source: int,
    max_iter: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """G6 — single-source shortest HOP counts by frontier BFS.

    Level-synchronous BFS, the Pregel shape: each round joins the
    CURRENT FRONTIER (only the nodes discovered last round — not the
    whole visited set) against the edge list, anti-joins out
    already-visited nodes, and stops at the first empty frontier.
    Work per round is O(edges incident to the frontier); total work is
    O(m) across all rounds regardless of diameter — the property that
    makes BFS feasible on billion-edge graphs where any
    quadratic-per-round formulation dies.

    Hop counts are INTEGERS: no float anywhere, so the result is
    exactly reproducible under any partitioning and a bounded-depth
    recursive CTE replays it row-for-row. Unreachable nodes simply
    never enter ``dist`` (callers left-join their node universe to
    surface them as NULL).

    Returns (node, dist).
    """
    spark = edges.sparkSession
    edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    dist = tiny_df(spark, [(int(source), 0)], "node long, dist int").localCheckpoint(
        eager=True
    )
    frontier = dist
    for level in range(1, max_iter + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(level).cast("int"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 40,
) -> DataFrame:
    """G7 — connected components by ALTERNATING large-star / small-star
    (Kiveris et al., SoCC'14) — the O(log n)-round scale path
    :func:`connected_components`'s docstring reserves for adversarial
    diameters.

    Min-label propagation needs DIAMETER rounds: a 10M-node chain
    (lineage graphs, session stitches, road networks) means 10M
    shuffles — dead at any scale. The star algorithm contracts the
    graph toward component-min-rooted stars instead, provably halving
    potential every alternation, so a 10M-node chain settles in ~25
    rounds and each round is one groupBy + one equi-join on node keys
    (no all-pairs, no frontier × visited):

    - ``large-star(u)``: connect every neighbor v > u to
      m(u) = min(Γ(u) ∪ {u}).
    - ``small-star(u)`` over edges oriented high→low: connect every
      smaller neighbor AND u itself to the minimum smaller neighbor.

    Both emissions preserve connectivity and never raise a node's
    eventual root (labels only contract toward the component min);
    at fixpoint the edge set IS the (node → component-min) star map.
    Equality with min-label propagation is property-tested on seeded
    random graphs in tests/test_graph_star.py.

    Returns (node, comp) for every node appearing in ``edges``,
    comp = min node id of the component (identical contract to
    :func:`connected_components`). Deterministic; raises if
    ``max_rounds`` alternations don't converge.
    """
    e = (
        edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    # Round shape (optimization round 11, guide §2.4): each star used
    # to be a groupBy(u) THEN a join back on u (min-neighbor lookup) —
    # two operators over one exchange — plus its own distinct exchange.
    # A window min over the same partitioning computes m(u) in the SAME
    # pass as the emission, removing the join entirely; and large-star
    # SKIPS its distinct (its duplicate emissions cannot change
    # small-star's per-u min, and small-star's distinct dedups the
    # final edge set), so one alternation is 3 exchanges —
    # Exchange(u)+window, Exchange(u)+window, Exchange(u,v) distinct —
    # instead of 4 with two joins.
    _wu = Window.partitionBy("u")

    def _large_star(ed: DataFrame) -> DataFrame:
        # symmetric neighborhoods; m(u) = min(Γ(u) ∪ {u})
        sym = ed.select("u", "v").union(
            ed.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        return (
            sym.withColumn("m", F.least(F.min("v").over(_wu), F.col("u")))
            .filter(F.col("v") > F.col("u"))  # strictly-greater neighbors re-attach
            .select(F.greatest("v", "m").alias("u"), F.least("v", "m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        # edges oriented u > v: connect v-neighborhood ∪ {u} to the
        # minimum smaller neighbor. (u, m) is emitted once per edge
        # row rather than once per u; the distinct collapses them.
        with_m = ed.withColumn("m", F.min("v").over(_wu))
        return (
            with_m.select(F.col("v").alias("n"), F.col("m"))
            .union(with_m.select(F.col("u").alias("n"), F.col("m")))
            .filter(F.col("n") != F.col("m"))
            .select(F.greatest("n", "m").alias("u"), F.least("n", "m").alias("v"))
            .distinct()
        )

    def _sig(ed: DataFrame) -> tuple[int, int]:
        # one partial-agg scan: (count, order-insensitive hash sum) —
        # the cheap fixpoint probe; a hash match merely TRIGGERS the
        # exact exceptAll confirmation below, it never decides alone
        row = ed.agg(
            F.count("*").alias("n"),
            # bit_xor: order-insensitive and overflow-free under ANSI
            # (the edge set is distinct, so xor acts on unique hashes)
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    sig = _sig(e)
    for _ in range(max_rounds):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig2 = _sig(e2)
        if sig2 == sig and e2.exceptAll(e).isEmpty():
            e = e2
            break
        e, sig = e2, sig2
    else:
        raise RuntimeError(f"star CC did not converge in {max_rounds} alternations")

    # fixpoint edges are (node → root) stars; roots map to themselves,
    # and nodes that contracted away entirely (isolated after dedup)
    # are their own roots
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    return (
        all_nodes.join(comp, "node", "left")
        .select("node", F.coalesce("comp", F.col("node")).alias("comp"))
    )


def sssp(
    edges: DataFrame,
    source: int,
    max_iter: int = 30,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """G8 — single-source shortest WEIGHTED paths by frontier-restricted
    Bellman-Ford relaxation (delta-less: every improved node joins the
    next frontier).

    The Pregel SSSP shape: each round relaxes only edges leaving nodes
    whose distance IMPROVED last round — after the wavefront passes a
    subgraph, its edges never rejoin the work set, so total work is
    O(m × relaxations-per-node) with the frontier join the only
    shuffle per round. Distances are exact integers (weights cast to
    long): no float accumulation, any partitioning reproduces the
    same table, and a staged-CTE oracle replays every round verbatim.

    Returns (node, dist) for reached nodes only — callers left-join
    their node universe to surface unreachable nodes as NULL.
    Deterministic; raises if ``max_iter`` rounds don't converge.
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        F.col(weight).cast("long").alias("w"),
    ).localCheckpoint(eager=True)
    dist = tiny_df(spark, [(int(source), 0)], "node long, dist long").localCheckpoint(
        eager=True
    )
    frontier = dist
    for _ in range(max_iter):
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("d"))
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
        merged = (
            dist.join(cand, "node", "full_outer")
            .select(
                "node",
                # least() skips NULLs, so this is "keep the better of
                # (old dist, new candidate)" with either side absent
                F.least(F.col("dist"), F.col("d")).alias("dist"),
                # improved: first sighting, or a strictly shorter path
                (F.col("dist").isNull() | (F.col("d") < F.col("dist"))).alias("_improved"),
            )
            .localCheckpoint(eager=True)
        )
        # frontier is a cheap filter over the just-checkpointed merged
        # state — a second materialization per round bought nothing
        # (optimization round 10: one checkpoint per round, not two)
        frontier = merged.filter("_improved").select("node", "dist")
        dist = merged.select("node", "dist")
        if frontier.isEmpty():
            return dist
    raise RuntimeError(f"sssp did not converge in {max_iter} rounds")


def k_core(
    edges: DataFrame,
    k: int,
    max_iter: int = 25,
    src: str = "src",
    dst: str = "dst",
    broadcast_threshold: int = 4_000_000,
) -> DataFrame:
    """G10 — the k-CORE of an undirected graph by FRONTIER-DECREMENT
    peeling (Seidman 1983; the Batagelj-Zaversnik cascade,
    distributed): round 0 computes degrees once, then each round only
    touches edges INCIDENT TO NEWLY-REMOVED nodes — their neighbors'
    degrees are decremented in place, nodes falling below k join the
    next frontier — until the frontier is empty. What remains is the
    maximal subgraph where every node keeps >= k neighbors, the
    standard dense-community / spam-ring signal over a transfer graph.

    Scale shape (the property that survives 100 TB): the symmetric
    edge table is checkpointed ONCE and never rewritten; each round is
    a broadcast semi-join of edges against the (small) frontier plus
    an n-row degree update — so TOTAL work across all rounds is
    O(m + rounds * n), not O(rounds * m), and the big side is scanned,
    never shuffled, after round 0. The broadcast hint is GATED on the
    measured frontier size (``broadcast_threshold`` rows, counted from
    the checkpointed n-row state — cheap): a large-k first frontier
    can be O(n), and an unconditional hint there is a driver OOM at
    cluster scale, so oversized frontiers fall back to a plain
    shuffled semi-join and AQE picks the join side. Rounds are
    bounded by the peeling depth, and the n-row degree state is
    localCheckpoint'd so the plan never grows (the G2/G8 pattern).

    Returns (node, core_deg) for k-core members, core_deg their degree
    WITHIN the core (maintained incrementally: every dead neighbor
    decremented it exactly once, via its directed dead edge).
    Deterministic: peeling is confluent — the k-core is unique
    regardless of deletion order. Raises if ``max_iter`` rounds don't
    converge.
    """
    one_way = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = (
        one_way.unionByName(one_way.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        sym.groupBy("u")
        .agg(F.count("*").alias("core_deg"))
        .select(F.col("u").alias("node"), "core_deg", F.lit(True).alias("alive"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        frontier = deg.filter(F.col("alive") & (F.col("core_deg") < k)).select("node")
        n_frontier = frontier.count()
        if n_frontier == 0:
            return deg.filter("alive").select("node", "core_deg")
        if n_frontier <= broadcast_threshold:
            hint = F.broadcast
        else:  # O(n) frontier (large k): shuffled semi-join, no driver OOM
            def hint(df: DataFrame) -> DataFrame:
                return df
        # edges leaving the frontier: each decrements its target once
        dead = sym.join(
            hint(frontier.withColumnRenamed("node", "u")), "u", "left_semi"
        )
        dec = dead.groupBy("v").agg(F.count("*").alias("d"))
        deg = (
            deg.join(dec, deg["node"] == dec["v"], "left")
            .join(
                hint(frontier.select(F.col("node").alias("r"))),
                deg["node"] == F.col("r"),
                "left",
            )
            .select(
                "node",
                (F.col("core_deg") - F.coalesce(F.col("d"), F.lit(0))).alias("core_deg"),
                (F.col("alive") & F.col("r").isNull()).alias("alive"),
            )
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"k_core did not converge in {max_iter} rounds")

"""Duplicate-GROUP extraction: connected components over verified
MinHash-LSH duplicate pairs (tail entry, fully oracled).

The oracle replays the ENTIRE pipeline in DuckDB — shingles,
signatures, banding, candidate join, Jaccard verify — then closes the
pair relation transitively with a recursive CTE, so even the iterative
graph step is value-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from datalake_polygonscan_spark.operators.dedup import minhash_lsh_duplicate_pairs
from datalake_polygonscan_spark.operators.graph import connected_components
from datalake_polygonscan_spark.queries.llm import MINHASH_PIPELINE_CTE
from datalake_polygonscan_spark.queries.registry import register
from datalake_polygonscan_spark.tables import load_table


@register(
    "l2_dedup_groups",
    oracle=f"""
    WITH RECURSIVE {MINHASH_PIPELINE_CTE}, dupp AS (
        SELECT c.da, c.db
        FROM cand c JOIN shset x ON x.doc_id = c.da JOIN shset y ON y.doc_id = c.db
        WHERE len(list_intersect(x.sh, y.sh))
              / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.5
    ), sym AS (
        SELECT da AS a, db AS b FROM dupp UNION SELECT db, da FROM dupp
    ), reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ), comp AS (
        SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a
    )
    SELECT d.doc_id,
           coalesce(c.comp, d.doc_id) AS group_id,
           CAST(count(*) OVER (PARTITION BY coalesce(c.comp, d.doc_id)) AS BIGINT) AS group_size
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
    doc="L2 duplicate GROUPS: verified MinHash-LSH pairs closed transitively via min-label-propagation connected components (operators/graph.py) — group_id = min doc_id in the component, singletons = own id. Oracle replays the whole pipeline AND the closure (recursive CTE), value-checking the iterative algorithm exactly",
)
def l2_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_duplicate_pairs(docs, "text", "doc_id", num_perm=16, bands=8, shingle_k=3, threshold=0.5)
    comp = connected_components(pairs, "doc_a", "doc_b")
    out = (
        docs.select("doc_id")
        .join(comp, docs["doc_id"] == comp["node"], "left")
        .select("doc_id", F.coalesce("comp", "doc_id").alias("group_id"))
    )
    return out.withColumn(
        "group_size", F.count("*").over(Window.partitionBy("group_id")).cast("long")
    )


# ---------------------------------------------------------------------------
# G2: PageRank with exact-decimal propagation
# ---------------------------------------------------------------------------

_PR_NODES = 200
_PR_ITER = 5


def _g2_oracle_sql(n_iter: int = _PR_ITER) -> str:
    """Replays the full PageRank loop as sequential MATERIALIZED CTEs
    — bit-identical per iteration by the exact-decimal contribution
    contract in operators/graph.py:pagerank."""
    sql = f"""
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT l_partkey % {_PR_NODES} AS src, l_suppkey % {_PR_NODES} AS dst FROM lineitem
    ), nodes AS MATERIALIZED (
        SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
    ), nc AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
    outdeg AS MATERIALIZED (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
    ), r_init AS MATERIALIZED (SELECT node, 1.0/(SELECT nn FROM nc) AS rank FROM nodes)"""
    prev = "r_init"
    for k in range(n_iter):
        sql += f""",
    s{k} AS MATERIALIZED (
        SELECT e.dst AS node,
               sum(CAST(round(r.rank / o.outdeg, 12) AS DECIMAL(28,12))) AS s
        FROM edges e JOIN {prev} r ON r.node = e.src JOIN outdeg o ON o.node = e.src
        GROUP BY e.dst
    ), r{k} AS MATERIALIZED (
        SELECT n.node,
               round((1 - 0.85)/(SELECT nn FROM nc)
                     + 0.85 * COALESCE(CAST(s.s AS DOUBLE), 0.0), 12) AS rank
        FROM nodes n LEFT JOIN s{k} s ON s.node = n.node
    )"""
        prev = f"r{k}"
    sql += f"""
    SELECT node, ROUND(rank, 8) AS rank,
           CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges
    FROM {prev}
    """
    return sql


@register(
    "g2_pagerank",
    oracle=_g2_oracle_sql(),
    doc=(
        "G2 PageRank with EXACT-DECIMAL propagation (operators/graph.py:pagerank) "
        "over the wallet-transfer-shaped graph derived from lineitem (distinct "
        "partkey->suppkey mod-200 edges): per edge contrib = round(rank/outdeg,12) "
        "cast DECIMAL(28,12), summed exactly per destination — order-insensitive "
        "under any partitioning, which is what makes iterative float propagation "
        "reproducible at cluster scale AND lets the oracle replay all 5 iterations "
        "as sequential MATERIALIZED CTEs bit-identically. One reused-exchange join "
        "+ one partial-agg sum per iteration, ranks localCheckpoint'd so the plan "
        "stays one-iteration deep; dangling mass leaks identically in both engines"
    ),
)
def g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_partkey") % _PR_NODES).alias("src"),
        (F.col("l_suppkey") % _PR_NODES).alias("dst"),
    ).distinct()
    ranks = pagerank(edges, n_iter=_PR_ITER)
    n_nodes = ranks.count()
    n_edges = edges.count()
    return ranks.select(
        "node",
        F.round("rank", 8).alias("rank"),
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.lit(n_edges).cast("long").alias("n_edges"),
    )


# ---------------------------------------------------------------------------
# G3: exact triangle counting via degree-ordered orientation
# ---------------------------------------------------------------------------

@register(
    "g3_triangle_count",
    oracle=f"""
    WITH canon AS (
        SELECT DISTINCT least(l_partkey % {_PR_NODES}, l_suppkey % {_PR_NODES}) AS a,
                        greatest(l_partkey % {_PR_NODES}, l_suppkey % {_PR_NODES}) AS b
        FROM lineitem WHERE l_partkey % {_PR_NODES} <> l_suppkey % {_PR_NODES}
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM canon UNION ALL SELECT b FROM canon
        ) GROUP BY node
    ), ori AS (
        SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND c.a < c.b)
                    THEN c.a ELSE c.b END AS u,
               CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND c.a < c.b)
                    THEN c.b ELSE c.a END AS v,
               CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND c.a < c.b)
                    THEN db.deg ELSE da.deg END AS dv
        FROM canon c JOIN deg da ON da.node = c.a JOIN deg db ON db.node = c.b
    ), tri AS (
        SELECT e1.u, e1.v AS v1, e2.v AS v2
        FROM ori e1 JOIN ori e2 ON e2.u = e1.u
             AND ((e1.dv < e2.dv) OR (e1.dv = e2.dv AND e1.v < e2.v))
             JOIN ori e3 ON e3.u = e1.v AND e3.v = e2.v
    ), per_node AS (
        SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
            SELECT u AS node FROM tri
            UNION ALL SELECT v1 FROM tri
            UNION ALL SELECT v2 FROM tri
        ) GROUP BY node
    )
    SELECT d.node, d.deg,
           CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_tri,
           ROUND(CASE WHEN d.deg >= 2
                      THEN 2.0 * coalesce(p.n_tri, 0) / (d.deg * (d.deg - 1))
                      ELSE 0.0 END, 8) AS clustering,
           CAST((SELECT CAST(sum(n_tri) AS BIGINT) / 3 FROM per_node) AS BIGINT) AS total_triangles
    FROM deg d LEFT JOIN per_node p ON p.node = d.node
    """,
    doc=(
        "G3 exact triangle counting by DEGREE-ORDERED orientation "
        "(operators/graph.py:triangle_count; Suri & Vassilvitskii WWW'11): "
        "orient each undirected edge from its lower-(degree,id) endpoint, "
        "enumerate wedges only at pivots (out-degree capped at O(sqrt m) so "
        "hub skew cannot fan out), close with one equi-join — O(m^1.5) total "
        "work regardless of degree distribution. Per-node participation "
        "counts + local clustering coefficient + global count, all exact; "
        "the oracle replays orientation/wedge/closure verbatim in SQL"
    ),
)
def g3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_partkey") % _PR_NODES).alias("src"),
        (F.col("l_suppkey") % _PR_NODES).alias("dst"),
    ).distinct()
    counts = triangle_count(edges)
    total = counts.agg((F.sum("n_tri") / 3).cast("long").alias("t")).collect()[0]["t"]
    cc = F.when(
        F.col("deg") >= 2,
        2.0 * F.col("n_tri") / (F.col("deg") * (F.col("deg") - 1)),
    ).otherwise(0.0)
    return counts.select(
        "node",
        "deg",
        "n_tri",
        F.round(cc, 8).alias("clustering"),
        F.lit(total).cast("long").alias("total_triangles"),
    )


# ---------------------------------------------------------------------------
# G5: label-propagation community detection
# ---------------------------------------------------------------------------

_LP_NODES = 400
_LP_ROUNDS = 4


def _g5_oracle_sql(n_rounds: int = _LP_ROUNDS) -> str:
    """Replays synchronous label propagation round-for-round: per
    round, (node, label) neighbor counts then argmax with the
    cnt-DESC / label-ASC tie-break — the same deterministic contract
    the Spark operator implements with max(struct(cnt, -label))."""
    sql = f"""
    WITH dir AS MATERIALIZED (
        SELECT DISTINCT l_partkey % {_LP_NODES} AS a, l_suppkey % {_LP_NODES} AS b
        FROM lineitem
        WHERE (l_partkey + l_suppkey) % 7 = 0
          AND l_partkey % {_LP_NODES} <> l_suppkey % {_LP_NODES}
    ), sym AS MATERIALIZED (
        SELECT a, b FROM dir UNION SELECT b, a FROM dir
    ), nodes AS MATERIALIZED (SELECT DISTINCT a AS node FROM sym),
    l_init AS MATERIALIZED (SELECT node, node AS label FROM nodes)"""
    prev = "l_init"
    for k in range(n_rounds):
        sql += f""",
    c{k} AS MATERIALIZED (
        SELECT s.a AS node, l.label, count(*) AS cnt
        FROM sym s JOIN {prev} l ON l.node = s.b
        GROUP BY s.a, l.label
    ), b{k} AS MATERIALIZED (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY cnt DESC, label ASC) AS rn
            FROM c{k}
        ) WHERE rn = 1
    ), l{k} AS MATERIALIZED (
        SELECT n.node, coalesce(b.label, p.label) AS label
        FROM nodes n
        LEFT JOIN b{k} b ON b.node = n.node
        JOIN {prev} p ON p.node = n.node
    )"""
        prev = f"l{k}"
    sql += f"""
    SELECT node, label AS community,
           CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS community_size,
           CAST((SELECT count(DISTINCT label) FROM {prev}) AS BIGINT) AS n_communities
    FROM {prev}
    """
    return sql


@register(
    "g5_label_propagation",
    oracle=_g5_oracle_sql(),
    doc=(
        "G5 community detection by synchronous LABEL PROPAGATION "
        "(operators/graph.py:label_propagation) over a sparsified "
        "wallet-transfer graph (mod-400 nodes, 1-in-7 edge filter): each "
        "round every node adopts its neighbors' most frequent label with a "
        "DETERMINISTIC tie-break (smallest label), argmax computed as one "
        "max(struct(cnt, -label)) aggregate — order-insensitive under any "
        "partitioning with no decimal contract needed (counts are integers). "
        "Fixed 4 rounds so the oracle replays the loop round-for-round as "
        "materialized CTEs (row_number cnt DESC, label ASC). Per-round cost "
        "is one neighbor join + one partial-agg count — the PageRank "
        "envelope; hubs cost their degree"
    ),
)
def g5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.graph import label_propagation

    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        li.filter((F.col("l_partkey") + F.col("l_suppkey")) % 7 == 0)
        .select(
            (F.col("l_partkey") % _LP_NODES).alias("src"),
            (F.col("l_suppkey") % _LP_NODES).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    labels = label_propagation(edges, n_rounds=_LP_ROUNDS)
    n_comm = labels.select("label").distinct().count()
    return labels.select(
        "node",
        F.col("label").alias("community"),
        F.count("*").over(Window.partitionBy("label")).cast("long").alias("community_size"),
        F.lit(n_comm).cast("long").alias("n_communities"),
    )


_BFS_NODES = 500
_BFS_DEPTH = 20


@register(
    "g6_bfs_shortest_hops",
    oracle=f"""
    WITH RECURSIVE edges AS MATERIALIZED (
        SELECT DISTINCT l_partkey % {_BFS_NODES} AS src, l_suppkey % {_BFS_NODES} AS dst
        FROM lineitem WHERE l_quantity = 1 AND l_partkey % {_BFS_NODES} <> l_suppkey % {_BFS_NODES}
        UNION
        SELECT DISTINCT l_suppkey % {_BFS_NODES}, l_partkey % {_BFS_NODES}
        FROM lineitem WHERE l_quantity = 1 AND l_partkey % {_BFS_NODES} <> l_suppkey % {_BFS_NODES}
    ), nodes AS (
        SELECT DISTINCT src AS node FROM edges
    ), walk(node, d) AS (
        SELECT CAST(0 AS BIGINT), 0
        UNION
        SELECT e.dst, w.d + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.d < {_BFS_DEPTH}
    ), sp AS (
        SELECT node, CAST(min(d) AS INTEGER) AS dist FROM walk GROUP BY node
    )
    SELECT n.node, sp.dist,
           CAST((SELECT count(*) FROM sp) AS BIGINT) AS n_reached,
           CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes
    FROM nodes n LEFT JOIN sp ON sp.node = n.node
    """,
    doc=(
        "G6 single-source shortest hop counts by level-synchronous "
        "frontier BFS (operators/graph.py:bfs_hops, the Pregel shape): "
        "each round joins only the LAST frontier against the edge "
        "list and anti-joins visited nodes, so total work is O(m) "
        "across all rounds — never frontier x visited. Sparse graph "
        "(quantity=1 lineitems, keys mod 500, symmetrized) keeps real "
        "multi-hop distances (0..4 at smoke SF; any unreachable node "
        "surfaces as NULL dist via the node-universe left join). "
        "Integer hops, zero floats: the oracle replays BFS as "
        "a bounded-depth recursive CTE with min-hop aggregation, "
        "row-for-row"
    ),
)
def g6_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.graph import bfs_hops

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") == 1)
    a = (F.col("l_partkey") % _BFS_NODES).alias("src")
    b = (F.col("l_suppkey") % _BFS_NODES).alias("dst")
    fwd = li.select(a, b).filter(F.col("src") != F.col("dst"))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    dist = bfs_hops(edges, source=0, max_iter=_BFS_DEPTH)
    n_reached = dist.count()
    n_nodes = nodes.count()
    return (
        nodes.join(dist, "node", "left")
        .select(
            "node",
            F.col("dist").cast("int").alias("dist"),
            F.lit(n_reached).cast("long").alias("n_reached"),
            F.lit(n_nodes).cast("long").alias("n_nodes"),
        )
    )


# ---------------------------------------------------------------------------
# G7 alternating-star connected components, G8 weighted shortest paths
# ---------------------------------------------------------------------------

_STAR_CHAINS = 7  # residue classes -> 7 long user chains


@register(
    "g7_cc_largestar",
    oracle=f"""
    WITH nodes AS (
        SELECT DISTINCT user_id AS node FROM events
    )
    SELECT node,
           min(node) OVER (PARTITION BY node % {_STAR_CHAINS}) AS component,
           CAST(count(*) OVER (PARTITION BY node % {_STAR_CHAINS}) AS BIGINT) AS comp_size,
           CAST({_STAR_CHAINS} AS BIGINT) AS n_components
    FROM nodes
    """,
    doc=(
        "G7 connected components by ALTERNATING LARGE-STAR/SMALL-STAR "
        "(Kiveris et al. SoCC'14; operators/graph.py:"
        "connected_components_star) — the O(log n)-round scale path "
        "for ADVERSARIAL-DIAMETER graphs, where round-per-hop "
        "min-label propagation (L2g's connected_components) needs "
        "DIAMETER shuffles and dies on any long chain. Input is "
        "deliberately the worst case: 7 user-id chains (consecutive "
        "ranks within user_id % 7 linked pairwise), diameter ~ n/7 — "
        "hundreds of min-label rounds at bench SF, but the star "
        "alternation contracts each chain toward its minimum in "
        "~log2(diameter) rounds (convergence asserted, rounds bounded "
        "in tests/test_graph_star.py; equality with min-label "
        "propagation property-tested on seeded random graphs). The "
        "oracle states the semantic truth in closed form — each "
        "chain's component IS its minimum user id — so any wrong "
        "attachment, dropped node or non-converged root value-fails"
    ),
)
def g7_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.graph import connected_components_star

    nodes = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("node")
    ).distinct()
    w = Window.partitionBy(F.col("node") % _STAR_CHAINS).orderBy("node")
    chain = nodes.select("node", F.lead("node").over(w).alias("nxt")).filter(
        F.col("nxt").isNotNull()
    )
    comp = connected_components_star(chain, "node", "nxt")
    return (
        comp.select("node", F.col("comp").alias("component"))
        .withColumn(
            "comp_size",
            F.count("*").over(Window.partitionBy("component")).cast("long"),
        )
        .withColumn("n_components", F.lit(_STAR_CHAINS).cast("long"))
    )


_SSSP_NODES = 1500
_SSSP_QMAX = 3
_SSSP_STAGES = 12  # oracle replay depth; Spark converges in <= 8 rounds


def _g8_oracle_sql(k: int = _SSSP_STAGES) -> str:
    """Staged-CTE Bellman-Ford replay: d_{{i+1}}(v) = min(d_i(v),
    min over edges (u,v) of d_i(u) + w) — K materialized rounds, the
    same exact-integer recurrence the frontier operator runs."""
    stages = []
    for i in range(1, k + 1):
        stages.append(
            f"""d{i} AS MATERIALIZED (
        SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM d{i-1}
            UNION ALL
            SELECT e.dst AS node, d.dist + e.w AS dist
            FROM d{i-1} d JOIN edges e ON e.src = d.node
        ) GROUP BY node
    )"""
        )
    joined = ",\n    ".join(stages)
    return f"""
    WITH raw AS (
        SELECT l_partkey % {_SSSP_NODES} AS a, l_suppkey % {_SSSP_NODES} AS b,
               CAST(1 + l_orderkey % 9 AS BIGINT) AS w
        FROM lineitem
        WHERE l_quantity <= {_SSSP_QMAX}
          AND l_partkey % {_SSSP_NODES} <> l_suppkey % {_SSSP_NODES}
    ), canon AS (
        SELECT least(a, b) AS v, greatest(a, b) AS u, min(w) AS w
        FROM raw GROUP BY 1, 2
    ), edges AS MATERIALIZED (
        SELECT u AS src, v AS dst, w FROM canon
        UNION ALL
        SELECT v AS src, u AS dst, w FROM canon
    ), nodes AS (
        SELECT DISTINCT src AS node FROM edges
    ), d0 AS (
        SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
    ),
    {joined}
    SELECT n.node, d.dist,
           CAST((SELECT count(*) FROM d{k}) AS BIGINT) AS n_reached,
           CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes
    FROM nodes n LEFT JOIN d{k} d ON d.node = n.node
    """


@register(
    "g8_sssp",
    oracle=_g8_oracle_sql(),
    doc=(
        "G8 single-source shortest WEIGHTED paths by frontier-"
        "restricted Bellman-Ford (operators/graph.py:sssp, the Pregel "
        "SSSP shape): each round relaxes only edges leaving nodes "
        "whose distance improved last round, so the wavefront never "
        "re-scans settled subgraphs — O(m x relaxations) total, one "
        "frontier equi-join shuffle per round, converges here in <= 8 "
        "rounds. Graph: lineitem quantity<=3 keys mod 1500 "
        "symmetrized, min-weight per pair, weights 1+l_orderkey%9 so "
        "weighted distances genuinely disagree with hop counts "
        "(max dist 18 over <= 8 hops at driver SF). Exact integer "
        "distances — no float accumulation, any partitioning "
        "reproduces the table bit-for-bit; the oracle replays all 12 "
        "relaxation rounds as materialized staged CTEs (the G2 "
        "PageRank replay pattern), so a wrong relaxation order, "
        "dropped frontier node or off-by-one weight value-fails; "
        "unreachable nodes surface as NULL via the node-universe "
        "left join"
    ),
)
def g8_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.graph import sssp

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= _SSSP_QMAX)
    raw = li.select(
        (F.col("l_partkey") % _SSSP_NODES).alias("a"),
        (F.col("l_suppkey") % _SSSP_NODES).alias("b"),
        (1 + F.col("l_orderkey") % 9).cast("long").alias("w"),
    ).filter(F.col("a") != F.col("b"))
    canon = (
        raw.select(F.least("a", "b").alias("v"), F.greatest("a", "b").alias("u"), "w")
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )
    edges = canon.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w").union(
        canon.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    dist = sssp(edges, source=0, max_iter=30)
    n_reached = dist.count()
    n_nodes = nodes.count()
    return nodes.join(dist, "node", "left").select(
        "node",
        F.col("dist").cast("long").alias("dist"),
        F.lit(n_reached).cast("long").alias("n_reached"),
        F.lit(n_nodes).cast("long").alias("n_nodes"),
    )


# ---------------------------------------------------------------------------
# G9 personalized PageRank: teleport mass on a seed set
# ---------------------------------------------------------------------------

_PPR_SEED_MOD = 20  # seeds = nodes divisible by 20 (~5% of the graph)


def _g9_oracle_sql(n_iter: int = _PR_ITER) -> str:
    """The G2 staged-CTE replay with the personalization twist: base
    teleport mass (1-d)/|S| on seed nodes and 0 elsewhere, ranks
    seeded 1/|S| on S."""
    sql = f"""
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT l_partkey % {_PR_NODES} AS src, l_suppkey % {_PR_NODES} AS dst FROM lineitem
    ), nodes0 AS MATERIALIZED (
        SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
    ), sc AS MATERIALIZED (
        SELECT CAST(count(*) AS DOUBLE) AS ns FROM nodes0 WHERE node % {_PPR_SEED_MOD} = 0
    ), nodes AS MATERIALIZED (
        SELECT node,
               CASE WHEN node % {_PPR_SEED_MOD} = 0
                    THEN (1 - 0.85) / (SELECT ns FROM sc) ELSE 0.0 END AS base
        FROM nodes0
    ), outdeg AS MATERIALIZED (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
    ), r_init AS MATERIALIZED (
        SELECT node, CASE WHEN base > 0 THEN 1.0 / (SELECT ns FROM sc) ELSE 0.0 END AS rank
        FROM nodes
    )"""
    prev = "r_init"
    for k in range(n_iter):
        sql += f""",
    s{k} AS MATERIALIZED (
        SELECT e.dst AS node,
               sum(CAST(round(r.rank / o.outdeg, 12) AS DECIMAL(28,12))) AS s
        FROM edges e JOIN {prev} r ON r.node = e.src JOIN outdeg o ON o.node = e.src
        GROUP BY e.dst
    ), r{k} AS MATERIALIZED (
        SELECT n.node,
               round(n.base + 0.85 * COALESCE(CAST(s.s AS DOUBLE), 0.0), 12) AS rank
        FROM nodes n LEFT JOIN s{k} s ON s.node = n.node
    )"""
        prev = f"r{k}"
    sql += f"""
    SELECT node, ROUND(rank, 8) AS rank,
           CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
           CAST((SELECT ns FROM sc) AS BIGINT) AS n_seeds
    FROM {prev}
    """
    return sql


@register(
    "g9_personalized_pagerank",
    oracle=_g9_oracle_sql(),
    doc=(
        "G9 PERSONALIZED PageRank (operators/graph.py:pagerank with a "
        "teleport set — the recommendation / trust-propagation / "
        "related-items form): the (1-d) teleport mass concentrates "
        "uniformly on the ~5%% seed set (nodes %% 20 == 0) and ranks "
        "seed from it, so scores measure proximity TO THE SEEDS "
        "rather than global centrality — nodes unreachable from the "
        "seed set score exactly 0, which the exact-decimal arithmetic "
        "preserves (a float formulation would smear epsilon mass "
        "everywhere). Same per-iteration shape as G2 — one "
        "reused-exchange join + one partial-agg exact-decimal sum; "
        "the personalization is one extra left-join flag materialized "
        "once. The oracle replays all 5 iterations as staged "
        "MATERIALIZED CTEs bit-identically"
    ),
)
def g9(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_partkey") % _PR_NODES).alias("src"),
        (F.col("l_suppkey") % _PR_NODES).alias("dst"),
    ).distinct()
    nodes = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    seeds = nodes.filter(F.col("node") % _PPR_SEED_MOD == 0)
    n_seeds = seeds.count()
    ranks = pagerank(edges, n_iter=_PR_ITER, teleport_nodes=seeds)
    n_nodes = nodes.count()
    return ranks.select(
        "node",
        F.round("rank", 8).alias("rank"),
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.lit(n_seeds).cast("long").alias("n_seeds"),
    )


# ---------------------------------------------------------------------------
# G10: k-core decomposition by iterative peeling
# ---------------------------------------------------------------------------

_KCORE_N = 3000
_KCORE_K = 2
_KCORE_TAILS = 8   # pendant paths hanging off nodes 0..7
_KCORE_LEN = 8     # path length -> peeling cascade depth
_KCORE_STAGES = 20  # oracle replay depth; cascade measured <= 9 at all
#                     shipped SFs, and the oracle PROVES convergence at
#                     its own depth via the oracle_converged flag below


def _g10_oracle_sql(stages: int = _KCORE_STAGES) -> str:
    """Replays the peeling cascade as STAGED CTEs (the G8 pattern):
    round i keeps only edges whose BOTH endpoints had degree >= k in
    round i-1; rounds past convergence are identities, so a fixed
    replay depth >= the true cascade length is exact. Because the base
    bipartite graph's cascade depth varies with scale factor, the
    replay SELF-CHECKS: ``oracle_converged`` is 1 iff the last two
    rounds kept the same edge count (a fixpoint — identity rounds
    follow), so an under-deep replay value-fails LOUDLY on that flag
    instead of silently under-peeling."""
    k, n, tails, ln = _KCORE_K, _KCORE_N, _KCORE_TAILS, _KCORE_LEN
    parts = [f"""
    WITH base AS MATERIALIZED (
        SELECT DISTINCT CAST(l_orderkey % {n} AS BIGINT) AS a,
               CAST({n} + l_partkey % {n} AS BIGINT) AS b
        FROM lineitem
    ), tails AS (
        SELECT unnest(generate_series(0, {tails - 1})) AS t
    ), chain AS (
        SELECT t, j FROM tails
        CROSS JOIN (SELECT unnest(generate_series(0, {ln - 2})) AS j) c
    ), alledges AS (
        SELECT a, b FROM base
        UNION ALL
        SELECT CAST(t AS BIGINT), CAST(7000 + t * {ln} AS BIGINT) FROM tails
        UNION ALL
        SELECT CAST(7000 + t * {ln} + j AS BIGINT),
               CAST(7000 + t * {ln} + j + 1 AS BIGINT) FROM chain
    ), sym0 AS MATERIALIZED (
        SELECT a AS u, b AS v FROM alledges WHERE a <> b
        UNION
        SELECT b AS u, a AS v FROM alledges WHERE a <> b
    )"""]
    for i in range(1, stages + 1):
        parts.append(f""", deg{i} AS MATERIALIZED (
        SELECT u, count(*) AS c FROM sym{i - 1} GROUP BY u
    ), sym{i} AS MATERIALIZED (
        SELECT s.u, s.v FROM sym{i - 1} s
        JOIN deg{i} d1 ON d1.u = s.u AND d1.c >= {k}
        JOIN deg{i} d2 ON d2.u = s.v AND d2.c >= {k}
    )""")
    parts.append(f""", core AS (
        SELECT u AS node, CAST(count(*) AS BIGINT) AS core_deg
        FROM sym{stages} GROUP BY u
    )
    SELECT node, core_deg,
           CAST((SELECT count(*) FROM core) AS BIGINT) AS n_core,
           CAST((SELECT count(*) FROM sym{stages})
                = (SELECT count(*) FROM sym{stages - 1}) AS INTEGER)
               AS oracle_converged
    FROM core
    """)
    return "".join(parts)


@register(
    "g10_kcore",
    oracle=_g10_oracle_sql(),
    doc=(
        "G10 k-CORE decomposition by iterative peeling (Seidman 1983 / "
        "Batagelj-Zaversnik, distributed as the Pregel-style cascade): "
        "each round deletes every node whose surviving degree is < k "
        "until fixpoint — the maximal subgraph where everyone keeps "
        ">= k neighbors, the dense-community/spam-ring signal over a "
        "transfer graph. One O(m) aggregation + one survivor semi-join "
        "per round, frontier localCheckpoint'd so the plan never grows "
        "(operators/graph.py:k_core); peeling is CONFLUENT so any "
        "deletion order lands on the same unique core. The fixture "
        "attaches {tails} pendant {ln}-node paths to the order/part "
        "bipartite graph, forcing a real multi-round cascade (paths "
        "peel one node per round from the free end — 8 rounds "
        "measured, the shape single-pass degree filters get wrong); "
        "the oracle replays every round as staged CTEs"
        .format(tails=_KCORE_TAILS, ln=_KCORE_LEN)
    ),
)
def g10_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.graph import k_core

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_orderkey") % _KCORE_N).cast("long").alias("src"),
        (F.lit(_KCORE_N) + F.col("l_partkey") % _KCORE_N).cast("long").alias("dst"),
    )
    tails = spark.range(_KCORE_TAILS).select(
        F.col("id").alias("src"), (F.lit(7000) + F.col("id") * _KCORE_LEN).alias("dst")
    )
    t_of = F.floor(F.col("id") / (_KCORE_LEN - 1))
    j_of = F.col("id") % (_KCORE_LEN - 1)
    chain = spark.range(_KCORE_TAILS * (_KCORE_LEN - 1)).select(
        (F.lit(7000) + t_of * _KCORE_LEN + j_of).alias("src"),
        (F.lit(7000) + t_of * _KCORE_LEN + j_of + 1).alias("dst"),
    )
    core = k_core(base.unionByName(tails).unionByName(chain), k=_KCORE_K)
    n_core = core.count()
    # k_core iterates to FIXPOINT, so the Spark side is converged by
    # construction; the literal 1 pins the oracle's self-check flag.
    return core.select(
        "node",
        "core_deg",
        F.lit(n_core).cast("long").alias("n_core"),
        F.lit(1).alias("oracle_converged"),
    )


# ---------------------------------------------------------------------------
# L16: dedup SURVIVORSHIP — canonical-document election per group
# ---------------------------------------------------------------------------


@register(
    "l16_dedup_survivorship",
    oracle=f"""
    WITH RECURSIVE {MINHASH_PIPELINE_CTE}, dupp AS (
        SELECT c.da, c.db
        FROM cand c JOIN shset x ON x.doc_id = c.da JOIN shset y ON y.doc_id = c.db
        WHERE len(list_intersect(x.sh, y.sh))
              / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.5
    ), sym AS (
        SELECT da AS a, db AS b FROM dupp UNION SELECT db, da FROM dupp
    ), reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ), comp AS (
        SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a
    ), grp AS (
        SELECT d.doc_id,
               coalesce(c.comp, d.doc_id) AS group_id,
               CAST(length(d.text) AS BIGINT) AS doc_len
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ), surv AS (
        SELECT group_id, doc_id AS survivor_id FROM (
            SELECT group_id, doc_id,
                   row_number() OVER (
                       PARTITION BY group_id
                       ORDER BY doc_len DESC, doc_id ASC) AS rn
            FROM grp
        ) WHERE rn = 1
    )
    SELECT g.doc_id, g.group_id,
           CAST(count(*) OVER (PARTITION BY g.group_id) AS BIGINT) AS group_size,
           s.survivor_id,
           CAST(g.doc_id = s.survivor_id AS INT) AS is_survivor,
           g.doc_len
    FROM grp g JOIN surv s USING (group_id)
    """,
    doc=(
        "L16 dedup SURVIVORSHIP: after near-dup groups form (verified "
        "MinHash-LSH pairs closed transitively — the L2g structure), "
        "a canonical document is ELECTED per group by an explicit "
        "policy (longest text wins, ties to the smallest id) and "
        "every member maps to its canonical — the keep-the-best rule "
        "real corpus dedup applies where L1/L2's min-id pick is "
        "arbitrary, and the survivorship step every ER pipeline runs "
        "after clustering. One rank window over the grouped table; "
        "the mapping (doc -> survivor) is the output a downstream "
        "rewrite joins against. Oracle replays shingles -> signatures "
        "-> banding -> verify -> transitive closure -> election "
        "value-for-value"
    ),
)
def l16_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_duplicate_pairs(
        docs, "text", "doc_id", num_perm=16, bands=8, shingle_k=3, threshold=0.5
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    grp = (
        docs.select("doc_id", F.length("text").cast("long").alias("doc_len"))
        .join(comp, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce("comp", "doc_id").alias("group_id"),
            "doc_len",
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("group_id").orderBy(F.desc("doc_len"), F.asc("doc_id"))
    )
    surv = (
        grp.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("group_id", F.col("doc_id").alias("survivor_id"))
    )
    return (
        grp.join(surv, "group_id")
        .select(
            "doc_id", "group_id",
            F.count("*").over(Window.partitionBy("group_id")).cast("long").alias("group_size"),
            "survivor_id",
            (F.col("doc_id") == F.col("survivor_id")).cast("int").alias("is_survivor"),
            "doc_len",
        )
    )

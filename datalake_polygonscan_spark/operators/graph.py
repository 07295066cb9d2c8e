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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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

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

"""Local clustering coefficient (wave 19).

`graph_clustering_coefficient` — cc(v) = 2·T(v) / (deg(v)·(deg(v)−1))
(Watts & Strogatz 1998): the fraction of a node's neighbor pairs that
are themselves connected.  The structural-cohesion readout next to the
triangle count it reuses — a curation pipeline reads it as "is this
entity's neighborhood a community or a star" (spam hubs have cc ≈ 0;
scraped mirror-clusters cc ≈ 1).

Exactness: T(v) and deg(v) are integers, so cc is an exact int64
fraction (num/den emitted + one division) — the `eval_cohens_kappa`
contract shape.

Scale: reuses the degree-oriented triangle machinery
(graph_ops.triangle_counts — wedge fan-out C(outdeg,2), outdeg ≤
O(√m) under compact-forward orientation) and the |nodes|-row degree
frame; one left join aligns them (nodes in no triangle get cc = 0,
degree-1 nodes a NULL cc — undefined, not zero).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.operators.graph_ops import (
    _O_EDGES,
    _symmetrized,
    copurchase_edges,
    triangle_counts,
)
from vector_ai_npm_spark.registry import query


@query(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH {_O_EDGES},
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM sym GROUP BY node
    ),
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM edges e1
      JOIN edges e2 ON e2.src = e1.dst
      JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    pernode AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT d.node, d.degree,
           CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST(2 * COALESCE(t.n_triangles, 0) AS BIGINT) AS cc_num,
           CAST(d.degree * (d.degree - 1) AS BIGINT) AS cc_den,
           CASE WHEN d.degree >= 2 THEN
             CAST(2 * COALESCE(t.n_triangles, 0) AS DOUBLE)
               / CAST(d.degree * (d.degree - 1) AS DOUBLE)
           END AS cc
    FROM deg d LEFT JOIN pernode t ON t.node = d.node
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient — see module docstring."""
    edges = copurchase_edges(spark, sf_dir).select("src", "dst")
    deg = (
        _symmetrized(edges.withColumn("w", F.lit(1)))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    tri = triangle_counts(edges)
    out = deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias(
            "n_triangles"
        ),
    )
    num = F.lit(2) * F.col("n_triangles")
    den = F.col("degree") * (F.col("degree") - 1)
    return out.select(
        "node",
        "degree",
        "n_triangles",
        num.cast("bigint").alias("cc_num"),
        den.cast("bigint").alias("cc_den"),
        F.when(
            F.col("degree") >= 2, num.cast("double") / den.cast("double")
        ).alias("cc"),
    )

"""Degree assortativity (wave 16) — completes the graph-metric family.

`graph_assortativity` — Newman's degree assortativity coefficient
(Newman 2002, "Assortative mixing in networks"): the Pearson
correlation of the degrees at the two ends of each edge, computed over
the symmetrized ordered-pair list (each undirected edge contributes
both (i,j) and (j,i), the standard estimator).  r > 0 means hubs link
to hubs (social-network shape), r < 0 means hubs link to leaves
(hub-and-spoke — typical for co-purchase/dependency graphs); it is the
one-number summary that decides whether hub-capping (graph Jaccard's
default) or degree salting is needed before heavier graph passes.

By pair symmetry sum(x) = sum(y) and sum(x^2) = sum(y^2), so
r = (M*Sxy - Sx^2) / (M*Sxx - Sx^2) with all five power sums integer
(degrees x counts).  The cross-products ride DECIMAL(19,0) x (19,0)
-> (38,0) in both engines (sums < 1e19 at any real corpus); numerator
and denominator cast to double through the varchar bridge, ONE final
division.

Scale: reuses copurchase_edges (operators/graph_ops.py — two shuffles,
inline basket expansion), a node-keyed degree aggregate, two
degree-frame joins keyed on the edge endpoints, and a 1-row fold.
The degree frame is node-sized; nothing quadratic anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.operators.eval_metrics import _o_d2d
from vector_ai_npm_spark.operators.graph_ops import _O_EDGES, copurchase_edges
from vector_ai_npm_spark.registry import query


@query(
    "graph_assortativity",
    oracle=f"""
    WITH {_O_EDGES},
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY node
    ), pairs AS (
      SELECT da.d AS dx, db.d AS dy
      FROM sym s JOIN deg da ON s.node = da.node
                 JOIN deg db ON s.nbr = db.node
    ), folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(CAST(dx AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(dx AS DECIMAL(19,0)) * CAST(dx AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(dx AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS sxy
      FROM pairs
    )
    SELECT m AS n_pairs,
           ({_o_d2d("CAST(CAST(m AS DECIMAL(19,0)) * sxy AS DECIMAL(38,0))")}
            - {_o_d2d("sx")} * {_o_d2d("sx")})
           / ({_o_d2d("CAST(CAST(m AS DECIMAL(19,0)) * sxx AS DECIMAL(38,0))")}
              - {_o_d2d("sx")} * {_o_d2d("sx")}) AS assortativity
    FROM folded
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity r over the co-purchase graph — see module
    docstring for the symmetric power-sum identity and scale shapes."""
    edges = copurchase_edges(spark, sf_dir).select("src", "dst")
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    dx = deg.select(F.col("src").alias("a"), F.col("d").alias("dx"))
    dy = deg.select(F.col("src").alias("b"), F.col("d").alias("dy"))
    pairs = (
        sym.join(dx, sym.src == dx.a)
        .join(dy, sym.dst == dy.b)
        .select("dx", "dy")
    )
    d19 = "decimal(19,0)"
    folded = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("dx").cast(d19)).cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("dx").cast(d19) * F.col("dx").cast(d19))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("dx").cast(d19) * F.col("dy").cast(d19))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    m_d = F.col("m").cast(d19)
    num = (m_d * F.col("sxy")).cast("decimal(38,0)").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sx").cast("double")
    den = (m_d * F.col("sxx")).cast("decimal(38,0)").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sx").cast("double")
    return folded.select(
        F.col("m").alias("n_pairs"), (num / den).alias("assortativity")
    )

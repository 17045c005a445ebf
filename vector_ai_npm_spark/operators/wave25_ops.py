"""Wave 25: average-neighbor-degree curve, repeat-purchase cohorts.

Two operators, each exact and oracle-checked:

* `graph_knn_curve` — the k_nn(k) average-neighbor-degree curve over
  the co-purchase graph (Pastor-Satorras 2001): for each degree class
  k, the mean degree of the neighbors of degree-k nodes.  This is the
  FUNCTIONAL face of `graph_assortativity`'s single Pearson number —
  a rising curve means hubs attach to hubs (assortative), a falling
  one means hubs attach to leaves (the hub-capping decision input,
  read alongside the §4r hub study).  Exact: each degree-k node
  contributes exactly k neighbor-degree terms, so
  k_nn(k) = Σ_{deg(u)=k} Σ_{v∈N(u)} deg(v) / (k·|{u: deg(u)=k}|)
  is one integer fraction per class — no per-node rational means.
* `orders_repeat_cohorts` — repeat-purchase rate by first-order-month
  cohort (the acquisition-quality readout next to `cohort_retention`'s
  event-based matrix, computed from the ORDERS fact): per cohort the
  customer count, share with ≥2 lifetime orders, and orders per
  customer — all exact integer fractions.

Scale shape: the knn curve reuses `copurchase_edges` (two shuffles,
inline basket pair expansion) and joins the edge frame against the
|nodes|-row degree frame on node keys — never a cross product; the
degree-class fold is ≤|distinct degrees| rows.  Repeat cohorts scan
orders once into a per-customer aggregate, then fold to ≤|months|
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.graph_ops import (
    _O_EDGES,
    _symmetrized,
    copurchase_edges,
)
from vector_ai_npm_spark.registry import query


@query(
    "graph_knn_curve",
    oracle=f"""
    WITH {_O_EDGES},
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS k
      FROM sym GROUP BY node
    ),
    terms AS (
      SELECT dn.k, dnbr.k AS k_nbr
      FROM sym s
      JOIN deg dn ON dn.node = s.node
      JOIN deg dnbr ON dnbr.node = s.nbr
    ),
    classes AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM deg GROUP BY k
    ),
    folds AS (
      SELECT k, CAST(SUM(k_nbr) AS BIGINT) AS sum_nbr_deg
      FROM terms GROUP BY k
    )
    SELECT c.k, c.n_nodes, f.sum_nbr_deg,
           CAST(c.k * c.n_nodes AS BIGINT) AS knn_den,
           CAST(f.sum_nbr_deg AS DOUBLE)
             / CAST(c.k * c.n_nodes AS DOUBLE) AS knn
    FROM classes c JOIN folds f ON f.k = c.k
    """,
)
def graph_knn_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k_nn(k) average-neighbor-degree curve — see module docstring.
    Edge frame ⋈ degree frame twice on node keys (the degree frame is
    |nodes|-row — broadcastable on the fixture, node-keyed shuffle at
    scale); the fold is ≤|distinct degrees| rows.  Unweighted degrees
    (edge multiplicity w is the threshold input, not a weight — the
    graph_assortativity convention)."""
    edges = copurchase_edges(spark, sf_dir)
    sym = _symmetrized(edges)
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    dn = deg.select(F.col("node"), F.col("k"))
    dnbr = deg.select(
        F.col("node").alias("nbr"), F.col("k").alias("k_nbr")
    )
    terms = sym.join(dn, "node").join(dnbr, "nbr")
    classes = deg.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
    folds = terms.groupBy("k").agg(
        F.sum("k_nbr").cast("bigint").alias("sum_nbr_deg")
    )
    den = (F.col("k") * F.col("n_nodes")).cast("bigint")
    return classes.join(folds, "k").select(
        "k", "n_nodes", "sum_nbr_deg",
        den.alias("knn_den"),
        (F.col("sum_nbr_deg").cast("double") / den.cast("double")).alias(
            "knn"
        ),
    )


@query(
    "orders_repeat_cohorts",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT cohort,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           CAST(SUM(n_orders) AS BIGINT) AS total_orders,
           CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS repeat_rate,
           CAST(SUM(n_orders) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS orders_per_customer
    FROM per_cust
    GROUP BY cohort
    """,
)
def orders_repeat_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate by first-order cohort — see module
    docstring.  One orders scan → per-customer aggregate (min date +
    count ride the same shuffle) → ≤|months|-row cohort fold; both
    rates are exact integer divisions."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias(
            "cohort"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    repeat = F.sum(
        F.when(F.col("n_orders") >= 2, 1).otherwise(0)
    ).cast("bigint")
    return per_cust.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        repeat.alias("n_repeat"),
        F.sum("n_orders").cast("bigint").alias("total_orders"),
        (repeat.cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "repeat_rate"
        ),
        (
            F.sum("n_orders").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("orders_per_customer"),
    )

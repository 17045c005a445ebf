"""HITS hubs & authorities (wave 12) on the directed customer→supplier
purchase graph — the directed companion to `graph_pagerank`.

Kleinberg 1999: on a directed graph, authority(v) accumulates from the
hubs pointing at it and hub(u) from the authorities it points at:

    a ← Aᵀ h ;  h ← A a

Key exactness property (round-7 review fix): HITS iterates are
SCALE-INVARIANT — normalizing between half-steps only multiplies every
score by a constant, which the final normalization cancels.  So the
iterations here run on RAW INTEGER path counts (h₀ = 1 per hub ⇒
a₁ = in-degree, h₁ = A a₁, a₂ = Aᵀ h₁ — all exact integers, folded in
DECIMAL(38,0) so nothing rounds), and the single L1 normalization
happens once at the end as one double division with identical chains
in both engines.  The earlier per-step normalize-then-decimal-fold
design quantized ~1/n scores at the DECIMAL(30,8) resolution — ~4
significant digits at sf0.1 and exactly zero at n ≥ 1e8 hubs; integer
counts have no such cliff (DECIMAL(38,0) holds path counts to 1e38 —
two iterations on a graph with max degree d keep counts ≤ n·d⁴,
comfortably inside at any real corpus; the bound is documented, not
silent).  L1 instead of Kleinberg's L2 keeps the ranking (positive
scaling) and avoids sqrt — the no-libm discipline.

Scale per half-step: scores ⋈ edges on one endpoint key + a keyed
aggregate on the other — node-keyed shuffles whose partitioning is
reusable across iterations (the pagerank plan note).  Edge build is
one fact-table shuffle, shared by all half-steps via localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_O_EDGES = """
    edges AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )"""


@query(
    "graph_hits",
    oracle=f"""
    WITH {_O_EDGES},
    a1 AS (
      SELECT s, CAST(COUNT(*) AS DECIMAL(38,0)) AS a
      FROM edges GROUP BY s
    ),
    h1 AS (
      SELECT e.c, CAST(SUM(a1.a) AS DECIMAL(38,0)) AS h
      FROM edges e JOIN a1 ON a1.s = e.s GROUP BY e.c
    ),
    a2 AS (
      SELECT e.s, CAST(SUM(h1.h) AS DECIMAL(38,0)) AS a
      FROM edges e JOIN h1 ON h1.c = e.c GROUP BY e.s
    ),
    tot AS (SELECT CAST(SUM(a) AS DECIMAL(38,0)) AS t FROM a2)
    SELECT s AS supp_id,
           CAST(a AS DOUBLE) / CAST(tot.t AS DOUBLE) AS authority
    FROM a2, tot
    """,
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier authority after two HITS iterations (h₀=1 ⇒ a₁=in-deg,
    h₁=A a₁, a₂=Aᵀ h₁), L1-normalized once — see module docstring for
    the integer-exact formulation."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    # all three half-step joins consume the edge frame
    edges = edges.localCheckpoint(eager=True)
    dec = "decimal(38,0)"
    a1 = edges.groupBy("s").agg(
        F.count(F.lit(1)).cast(dec).alias("a")
    )
    h1 = (
        edges.join(a1, "s")
        .groupBy("c")
        .agg(F.sum("a").cast(dec).alias("h"))
    )
    a2 = (
        edges.join(h1, "c")
        .groupBy("s")
        .agg(F.sum("h").cast(dec).alias("a"))
    )
    tot = a2.agg(F.sum("a").cast(dec).alias("t"))
    return a2.join(F.broadcast(tot), how="cross").select(
        F.col("s").alias("supp_id"),
        (F.col("a").cast("double") / F.col("t").cast("double")).alias(
            "authority"
        ),
    )

"""HITS hubs & authorities (wave 12) on the directed customer→supplier
purchase graph — the directed companion to `graph_pagerank`.

Kleinberg 1999: on a directed graph, authority(v) accumulates from the
hubs pointing at it and hub(u) from the authorities it points at:

    a ← Aᵀ h ;  h ← A a        (normalized each half-step)

Two synchronous iterations, unrolled (the graph_pagerank discipline) so
the oracle replays the identical algebra.  Normalization is L1 (sum),
not Kleinberg's L2: the ranking is identical (positive scalar scaling)
and it avoids sqrt while keeping every fold in exact decimal — the
same no-libm reasoning as the KS/chi-square faces.  The bipartite
customer→supplier edge set comes from lineitem ⋈ orders (who bought
from whom), deduplicated to distinct pairs.

Scale per half-step: scores ⋈ edges on one endpoint key + a keyed
aggregate on the other — node-keyed shuffles whose partitioning is
reusable across iterations (the pagerank plan note); L1 totals are
broadcast 1-row frames.  Edge build is one fact-table shuffle, shared
by both iterations via the same cached frame pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.numeric import dsum, o_dsum
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_O_EDGES = """
    edges AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )"""


def _o_iter(h_in: str, a_out: str, h_out: str) -> str:
    """One unrolled HITS iteration: raw authority from hubs, L1
    normalize, raw hub from normalized authorities, L1 normalize."""
    return f"""
    {a_out}_raw AS (
      SELECT e.s, {o_dsum('h.h')} AS a FROM edges e
      JOIN {h_in} h ON h.c = e.c GROUP BY e.s
    ), {a_out}_tot AS (SELECT {o_dsum('a')} AS t FROM {a_out}_raw),
    {a_out} AS (
      SELECT s, a / t.t AS a FROM {a_out}_raw, {a_out}_tot t
    ), {h_out}_raw AS (
      SELECT e.c, {o_dsum('a.a')} AS h FROM edges e
      JOIN {a_out} a ON a.s = e.s GROUP BY e.c
    ), {h_out}_tot AS (SELECT {o_dsum('h')} AS t FROM {h_out}_raw),
    {h_out} AS (
      SELECT c, h / t.t AS h FROM {h_out}_raw, {h_out}_tot t
    )"""


@query(
    "graph_hits",
    oracle=f"""
    WITH {_O_EDGES},
    h0_raw AS (SELECT DISTINCT c FROM edges),
    h0_n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM h0_raw),
    h0 AS (SELECT c, 1.0 / n.n AS h FROM h0_raw, h0_n n),
    {_o_iter('h0', 'a1', 'h1')},
    {_o_iter('h1', 'a2', 'h2')}
    SELECT s AS supp_id, a AS authority FROM a2
    """,
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier authority scores after two HITS iterations — see module
    docstring.  Returns (supp_id, authority), L1-normalized."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    # both iterations (4 half-steps) consume the edge frame
    edges = edges.localCheckpoint(eager=True)

    hubs = edges.select("c").distinct()
    n = hubs.count()
    h = hubs.select("c", (F.lit(1.0) / F.lit(float(n))).alias("h"))

    def half_step(scores: DataFrame, key_in: str, key_out: str,
                  col_in: str, col_out: str) -> DataFrame:
        raw = (
            edges.join(scores, key_in)
            .groupBy(key_out)
            .agg(dsum(col_in, col_out))
        )
        tot = raw.agg(dsum(col_out, "t"))
        return raw.join(F.broadcast(tot), how="cross").select(
            key_out, (F.col(col_out) / F.col("t")).alias(col_out)
        )

    for _ in range(2):
        a = half_step(h, "c", "s", "h", "a")
        h = half_step(a, "s", "c", "a", "h")
    return a.select(F.col("s").alias("supp_id"), F.col("a").alias("authority"))

"""Wave 35: personalized PageRank from a seed set.

`graph_pagerank_personalized` — the random-walk-with-restart variant
of graph_pagerank: teleport mass returns to a SEED SET instead of the
whole graph, so rank concentrates in the seeds' neighborhood.  This
is the standard "related items / local importance" primitive
(Haveliwala 2002, topic-sensitive PageRank; Jeh & Widom 2003): on a
training-data platform it scores crawl frontier URLs by proximity to
trusted seed domains.

Construction (both engines identically):

  * seeds — top-5 nodes by (degree DESC, node) on the weighted
    co-purchase graph (deterministic, data-derived);
  * r₀ = 1/|S| on the seeds, implicit 0 elsewhere (absent rows);
  * 3 unrolled steps of r' = 0.85·Σ_{u→v} r(u)/d(u) + 0.15/|S|·1[v∈S],
    expressed as a contribution leg UNION ALL a teleport leg folded
    per node.  The neighbor sum — the only order-sensitive reduction —
    goes through the FLOOR MICRO-LEDGER (Σ floor(r/d·10¹⁵+½) as int64,
    ÷10¹⁵ once per node): r/d is a computed ratio, and the decimal-
    cast dsum diverged on a repr-vs-binary half-point at sf0.1 (the
    TUNING round-8 rule, re-measured here).  The final per-node fold
    has ≤2 addends (one contribution total + one teleport), and
    two-addend IEEE addition is commutative, so partial-aggregation
    order can't flip a bit.

Scale shape: identical to graph_pagerank — each step is one shuffle
join on the node key (partitioning reused across steps) + one keyed
aggregate; the seed list is a broadcast 5-row frame.  Rank mass lives
only on REACHED nodes (absent = exact zero), so a PPR over a 100 TB
graph from a small seed set touches the seeds' k-hop ball, not the
whole graph — the locality that makes PPR the scalable choice for
per-entity relevance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.operators.graph_ops import (
    _O_EDGES,
    _pagerank_sym_cached,
)
from vector_ai_npm_spark.registry import query

_N_SEEDS = 5
_N_ITER = 3


# Neighbor-sum via the FLOOR MICRO-LEDGER, not the decimal-cast dsum:
# r/d is a COMPUTED ratio, and the scale-8 decimal cast diverges on
# repr-vs-binary half-points (measured here at sf0.1: one addend
# quantized 1 quantum apart → a 0.85·10⁻⁸ rank gap; the TUNING
# round-8 rule).  FLOOR(x·10¹⁵+½) over correctly-rounded ×/+ is
# engine-identical by IEEE; Σr/d ≤ 1 keeps the int64 ledger ≤ 10¹⁵.
_LEDGER = "1e15"


def _o_ppr_iter(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT node, SUM(m) AS r FROM (
        SELECT t.node,
               0.85 * (CAST(t.s AS DOUBLE) / {_LEDGER}) AS m
        FROM (
          SELECT s.nbr AS node,
                 CAST(SUM(CAST(FLOOR({prev}.r / dg.d * {_LEDGER} + 0.5)
                               AS BIGINT)) AS BIGINT) AS s
          FROM sym s
          JOIN {prev} ON {prev}.node = s.node
          JOIN deg dg ON dg.node = s.node
          GROUP BY s.nbr
        ) t
        UNION ALL
        SELECT node, CAST(0.03 AS DOUBLE) AS m FROM seeds
      ) GROUP BY node
    )
    """


@query(
    "graph_pagerank_personalized",
    oracle=f"""
    WITH {_O_EDGES},
    deg AS (SELECT node, CAST(COUNT(*) AS DOUBLE) AS d
            FROM sym GROUP BY node),
    seeds AS (SELECT node FROM
              (SELECT node FROM deg ORDER BY d DESC, node
               LIMIT {_N_SEEDS})),
    r0 AS (SELECT node, CAST(0.2 AS DOUBLE) AS r FROM seeds),
    {_o_ppr_iter("r0", "r1")},
    {_o_ppr_iter("r1", "r2")},
    {_o_ppr_iter("r2", "r3")}
    SELECT node, r AS ppr FROM r3
    """,
)
def graph_pagerank_personalized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Personalized PageRank — see module docstring."""
    sym = _pagerank_sym_cached(spark, sf_dir)
    # same shallow-plan discipline as _pagerank_over_sym (r13): deg is
    # read by every step — checkpoint it once; checkpoint ranks per
    # step so the plan depth stays constant instead of nesting k deep
    deg = (
        sym.groupBy("node")
        .agg(F.count(F.lit(1)).cast("double").alias("d"))
        .localCheckpoint(eager=True)
    )
    seeds = (
        deg.orderBy(F.col("d").desc(), F.col("node"))
        .limit(_N_SEEDS)
        .select("node")
        .localCheckpoint(eager=True)
    )
    ranks = seeds.select("node", F.lit(0.2).alias("r"))
    tele = seeds.select("node", F.lit(0.03).alias("m"))
    for _i in range(_N_ITER):
        contrib = (
            sym.join(ranks, "node")
            .join(deg, "node")
            .groupBy(F.col("nbr").alias("node"))
            .agg(
                F.sum(
                    F.floor(
                        F.col("r") / F.col("d") * F.lit(1e15) + F.lit(0.5)
                    ).cast("bigint")
                )
                .cast("bigint")
                .alias("s")
            )
            .select(
                "node",
                (
                    F.lit(0.85)
                    * (F.col("s").cast("double") / F.lit(1e15))
                ).alias("m"),
            )
        )
        ranks = (
            contrib.unionByName(tele)
            .groupBy("node")
            .agg(F.sum("m").alias("r"))
        )
        if _i < _N_ITER - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").alias("ppr"))

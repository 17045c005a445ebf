"""Community detection via synchronous label propagation (wave 3).

LPA (Raghavan-Albert-Kumara 2007): every node starts in its own
community and repeatedly adopts the most frequent label among its
neighbors.  Unlike `dedup_components` (min-label propagation → connected
components), LPA partitions a CONNECTED graph into dense communities —
the product-affinity segmentation over the co-purchase graph.

Determinism: classic LPA is order- and tie-unstable; this face is the
deterministic synchronous variant — all nodes update simultaneously per
round, ties break toward the SMALLEST label (count DESC, label ASC), and
the round count is fixed at ``_ROUNDS`` with the oracle unrolling the
identical iterations (the graph_pagerank fixed-unroll discipline).
Fixed-round synchronous LPA is a declared semantic here, not an
approximation of something else: both engines compute the same function.

Scale shape: per round ONE edges⋈labels hash join (labels frame is
node-sized), one (node, label) count aggregate, and a WindowGroupLimit
top-1 — all keyed by node, so one shuffle key serves the round.  Label
lineage grows linearly in rounds (each round references the previous
once), so no per-round checkpoint is needed — contrast graph_kcore,
whose frontier is referenced three times per round (3^R plan blowup).
The symmetric edge list is the shared cached frame
(graph_ops._pagerank_sym_cached).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.operators.graph_ops import (
    _O_EDGES,
    _pagerank_sym_cached,
)
from vector_ai_npm_spark.registry import query

_ROUNDS = 3


def _o_lpa_sql(rounds: int) -> str:
    """Unrolled DuckDB mirror; MATERIALIZED so each round is one pass
    (the graph_kcore inlining lesson)."""
    ctes = [
        "l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM sym)"
    ]
    for r in range(rounds):
        ctes.append(
            f"t{r} AS MATERIALIZED (SELECT s.node, l.label, "
            f"CAST(COUNT(*) AS BIGINT) AS c "
            f"FROM sym s JOIN l{r} l ON s.nbr = l.node "
            f"GROUP BY s.node, l.label)"
        )
        ctes.append(
            f"l{r + 1} AS MATERIALIZED (SELECT node, label FROM ("
            f"SELECT node, label, ROW_NUMBER() OVER ("
            f"PARTITION BY node ORDER BY c DESC, label) AS rn FROM t{r}"
            f") WHERE rn = 1)"
        )
    return (
        f"WITH {_O_EDGES}, {', '.join(ctes)} "
        f"SELECT node, CAST(label AS BIGINT) AS community "
        f"FROM l{rounds}"
    )


@query("graph_community_lpa", oracle=_o_lpa_sql(_ROUNDS))
def graph_community_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph suite: community label per node after 3 synchronous LPA
    rounds over the co-purchase graph (deterministic smallest-label
    tiebreak) — see module docstring."""
    sym = _pagerank_sym_cached(spark, sf_dir)
    labels = sym.select("node").distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(_ROUNDS):
        nbr_labels = sym.join(
            labels.withColumnRenamed("node", "nbr"), "nbr"
        ).select("node", "label")
        tallies = nbr_labels.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.col("label"))
        labels = (
            tallies.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels.select("node", F.col("label").alias("community"))

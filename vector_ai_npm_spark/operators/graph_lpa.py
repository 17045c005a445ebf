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


def _o_lpa_ctes(rounds: int) -> list[str]:
    """Unrolled LPA CTE chain ending in ``l{rounds}``; MATERIALIZED so
    each round is one pass (the graph_kcore inlining lesson)."""
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
    return ctes


def _o_lpa_sql(rounds: int) -> str:
    return (
        f"WITH {_O_EDGES}, {', '.join(_o_lpa_ctes(rounds))} "
        f"SELECT node, CAST(label AS BIGINT) AS community "
        f"FROM l{rounds}"
    )


@query("graph_community_lpa", oracle=_o_lpa_sql(_ROUNDS))
def graph_community_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph suite: community label per node after 3 synchronous LPA
    rounds over the co-purchase graph (deterministic smallest-label
    tiebreak) — see module docstring."""
    sym = _pagerank_sym_cached(spark, sf_dir)
    return lpa_labels(sym, _ROUNDS).select(
        "node", F.col("label").alias("community")
    )


def lpa_labels(sym: DataFrame, rounds: int) -> DataFrame:
    """(node, label) after ``rounds`` synchronous LPA rounds."""
    labels = sym.select("node").distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(rounds):
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
    return labels


_O_MODULARITY = (
    f"WITH {_O_EDGES}, {', '.join(_o_lpa_ctes(_ROUNDS))}, "
    f"""lab AS MATERIALIZED (SELECT node, label FROM l{_ROUNDS}),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
            FROM sym GROUP BY node),
    m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM sym),
    intra AS (
      SELECT ln.label, CAST(COUNT(*) AS BIGINT) AS ic
      FROM sym s
      JOIN lab ln ON s.node = ln.node
      JOIN lab lb ON s.nbr = lb.node
      WHERE ln.label = lb.label
      GROUP BY ln.label),
    per_c AS (
      SELECT lab.label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(deg.d) AS BIGINT) AS degree_sum
      FROM lab JOIN deg USING (node) GROUP BY lab.label)
    SELECT CAST(p.label AS BIGINT) AS community,
           p.n_nodes,
           COALESCE(intra.ic, 0) // 2 AS intra_edges,
           p.degree_sum,
           CAST(COALESCE(intra.ic, 0) AS DOUBLE) / CAST(m2.m2 AS DOUBLE)
             - (CAST(p.degree_sum AS DOUBLE) / CAST(m2.m2 AS DOUBLE))
               * (CAST(p.degree_sum AS DOUBLE) / CAST(m2.m2 AS DOUBLE))
             AS q_c
    FROM per_c p LEFT JOIN intra ON p.label = intra.label
    CROSS JOIN m2"""
)


@query("graph_modularity", oracle=_O_MODULARITY)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity per LPA community — the quality metric that
    turns "LPA produced labels" into "LPA produced COMMUNITIES":
    q_c = L_c/m − (D_c/2m)², with Q = Σ q_c the score compared across
    community algorithms (Newman & Girvan 2004).

    Plan: reuses the cached symmetric edge frame and the 3-round LPA
    labels; the label frame joins the edge list ONCE on each endpoint
    (node-keyed shuffles), intra-community edges and degree sums are
    community-keyed aggregates (community-cardinality output), and 2m
    attaches as a broadcast scalar — the same decomposition budget as
    graph_pagerank, nothing beyond node/community-keyed state.

    Exactness: intra counts and degree sums are int64; q_c is a fixed
    dag of two divisions, one multiply, one subtract on exact inputs —
    bit-identical cross-engine, no dsum needed.
    """
    sym = _pagerank_sym_cached(spark, sf_dir).select("node", "nbr")
    lab = lpa_labels(sym, _ROUNDS).localCheckpoint(eager=True)
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    m2 = F.broadcast(sym.agg(F.count(F.lit(1)).alias("m2")))
    intra = (
        sym.join(lab, "node")
        .join(
            lab.select(
                F.col("node").alias("nbr"), F.col("label").alias("lb")
            ),
            "nbr",
        )
        .where(F.col("label") == F.col("lb"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("ic"))
    )
    per_c = (
        lab.join(deg, "node")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("d").alias("degree_sum"),
        )
    )
    ic = F.coalesce("ic", F.lit(0).cast("long"))
    ds_frac = F.col("degree_sum").cast("double") / F.col("m2").cast("double")
    return (
        per_c.join(intra, "label", "left")
        .crossJoin(m2)
        .select(
            F.col("label").alias("community"),
            "n_nodes",
            (ic / F.lit(2)).cast("long").alias("intra_edges"),
            "degree_sum",
            (
                ic.cast("double") / F.col("m2").cast("double")
                - ds_frac * ds_frac
            ).alias("q_c"),
        )
    )

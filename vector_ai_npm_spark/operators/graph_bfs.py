"""Multi-source BFS distance labeling (wave 9) over the co-purchase graph.

`graph_bfs_frontier` computes hop distance (≤ 3) from the top-5
highest-degree hub products to every reachable node — the
"distance-to-hub" feature used for graph-position features, influence
radii, and seed-expansion labeling.  Together with pagerank (global
importance), k-core (density), LPA (community) and triangles (local
clustering) this completes the classic node-feature suite.

Distributed formulation: synchronous FRONTIER expansion (the Pregel/
GraphX BFS):

    dist₀ = seeds × {0};  frontier₀ = dist₀
    frontierᵣ₊₁ = (frontierᵣ ⋈ edges).nbr  ∖  distᵣ      (anti join)
    distᵣ₊₁    = distᵣ ∪ (frontierᵣ₊₁ × {r+1})

Per round: ONE node-keyed join of the current frontier against the edge
list + one anti join against the visited set — cost proportional to the
frontier's edge neighborhood, never to the whole graph re-walked.  The
naive alternative (re-aggregating min-dist over all discovered paths
each round) rescans every prior level per round; the frontier form is
the textbook delta iteration.

Lineage discipline: frontier and visited frames are
``localCheckpoint(eager=True)``-ed per round — same medicine as
graph_kcore (the plan tree references each round's result twice; unchecked
it grows exponentially during analysis).  Production: reliable
checkpoint dir.

Fixed-unroll discipline (graph_pagerank/kcore decision): 3 rounds
declared and oracle-unrolled; the oracle mirrors the same frontier
construction with MATERIALIZED CTEs (DuckDB re-inlines each reference
otherwise — the kcore 3^R lesson).

Seeds are data-derived but dim-sized: the degree aggregate is
node-keyed (one shuffle) and top-5 is a TakeOrdered — no global sort.
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
_ROUNDS = 3


def _o_bfs_sql(n_seeds: int, rounds: int) -> str:
    ctes = [
        "e0 AS MATERIALIZED (SELECT node, nbr FROM sym)",
        "deg AS MATERIALIZED "
        "(SELECT node, COUNT(*) AS c FROM e0 GROUP BY node)",
        f"d0 AS MATERIALIZED (SELECT node, 0 AS dist FROM "
        f"(SELECT node FROM deg ORDER BY c DESC, node LIMIT {n_seeds}))",
        "f0 AS MATERIALIZED (SELECT node FROM d0)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"n{r} AS MATERIALIZED (SELECT DISTINCT e.nbr AS node "
            f"FROM f{r - 1} f JOIN e0 e ON e.node = f.node)"
        )
        ctes.append(
            f"f{r} AS MATERIALIZED (SELECT n.node FROM n{r} n "
            f"ANTI JOIN d{r - 1} d ON n.node = d.node)"
        )
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT node, dist FROM d{r - 1} "
            f"UNION ALL SELECT node, {r} AS dist FROM f{r})"
        )
    return (
        f"WITH {_O_EDGES}, {', '.join(ctes)} "
        f"SELECT node, CAST(dist AS BIGINT) AS dist FROM d{rounds}"
    )


@query("graph_bfs_frontier", oracle=_o_bfs_sql(_N_SEEDS, _ROUNDS))
def graph_bfs_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance (0–3) from the 5 highest-degree hubs — synchronous
    frontier BFS; see module docstring for the per-round shape."""
    sym = _pagerank_sym_cached(spark, sf_dir).select("node", "nbr")
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("c"))
    seeds = (
        deg.orderBy(F.desc("c"), F.asc("node"))
        .limit(_N_SEEDS)
        .select("node", F.lit(0).alias("dist"))
    )
    from vector_ai_npm_spark.io.sources import materialize_count

    dist = seeds.localCheckpoint(eager=True)
    frontier = dist.select("node").localCheckpoint(eager=True)
    for r in range(1, _ROUNDS + 1):
        neighbors = (
            frontier.join(sym, "node")
            .select(F.col("nbr").alias("node"))
            .distinct()
        )
        newly = neighbors.join(dist, "node", "left_anti").localCheckpoint(
            eager=False
        )
        # r14: the frontier checkpoint is lazy and the materializing
        # count doubles as the dead-frontier witness — an EMPTY frontier
        # makes every remaining round the identity (no neighbors, no new
        # nodes, dist unchanged), so skipping them is bit-identical to
        # the full unroll.  Same one-job-per-frame count as the old
        # eager checkpoint.
        if materialize_count(newly) == 0:
            break
        dist = dist.unionByName(
            newly.select("node", F.lit(r).alias("dist"))
        ).localCheckpoint(eager=True)
        frontier = newly
    return dist.select("node", F.col("dist").cast("bigint").alias("dist"))

"""k-core decomposition (wave 3) over the co-purchase graph.

The k-core is the maximal subgraph in which every node has degree ≥ k —
the standard dense-substructure extractor (Seidman 1983; Batagelj-
Zaveršnik peeling): spam-ring detection, community nuclei, and the
degeneracy-ordering input for faster triangle/clique algorithms.

Distributed formulation: synchronous PEELING — each round drops every
node whose degree in the SURVIVING subgraph is < k, until a fixpoint.
Per round: one degree aggregate (node-keyed) + two semi joins restricting
the edge list to surviving endpoints.  The alive frontier shrinks
monotonically, so round cost is bounded by the current subgraph, and the
round count is bounded by the peel depth (≤ the graph's degeneracy
chain, 5 at the largest fixture; real graphs converge in tens of rounds
— each round is one Spark job, NOT one job per node as sequential
peeling would be).

Fixed-unroll discipline (the graph_pagerank / recursive-CTE decision):
the registry face unrolls ``_ROUNDS = 6`` peel rounds — strictly more
than any fixture needs (measured fixpoint depth: 0 / 3 / 5 rounds at
sf0.001 / 0.01 / 0.1) — and tests/test_wave7.py (test_kcore_fixpoint_reached) proves round
R−1 ≡ round R on real fixtures, so the unrolled answer IS the exact
k-core, not an approximation.  The production loop iterates until a
per-round ``dropped == 0`` 1-row aggregate instead (same plan per
round, data-dependent round count).

Lineage discipline: each round's surviving edge list is
``localCheckpoint(eager=True)``-ed.  ``persist()`` is NOT enough here —
e{r+1}'s logical plan references e{r} three times (directly + twice via
the alive frontier), so even with every intermediate cached the PLAN
TREE grows 3^R nodes and the driver OOMs during analysis at R=6
(measured: java heap exhaustion at sf0.01).  Checkpointing truncates
the lineage to a leaf scan per round, keeping plans O(1) per round and
total work O(R) passes — the standard iterative-algorithm recipe
(GraphX/Pregel does exactly this internally).  In production the
checkpoint goes to reliable storage (``sparkContext.setCheckpointDir``
+ ``checkpoint()``); local executor storage is the single-node face.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import materialize_count
from vector_ai_npm_spark.operators.graph_ops import (
    _O_EDGES,
    _pagerank_sym_cached,
)
from vector_ai_npm_spark.registry import query

_K = 2        # repeat-co-purchase graph is sparse (median degree 1-3 at
# sf0.1); the 2-core strips the tree-like fringe while keeping a
# non-trivial core at every fixture scale (1535/1880 nodes at sf0.01)
_ROUNDS = 6   # > measured fixpoint depth at every fixture sf (max 5)


def _o_kcore_sql(k: int, rounds: int) -> str:
    """Unrolled DuckDB peeling: e{r} → d{r} → a{r} → e{r+1}."""
    # MATERIALIZED: DuckDB inlines CTEs by default, and e{r+1}
    # references e{r} three times (directly + via d{r}/a{r}) — inlined,
    # the unrolled peel expands 3^rounds times (measured 113 s at
    # sf0.01); materialized, it is one pass per round (<1 s)
    ctes = ["e0 AS MATERIALIZED (SELECT node, nbr FROM sym)"]
    for r in range(rounds):
        ctes.append(
            f"d{r} AS MATERIALIZED "
            f"(SELECT node, COUNT(*) AS c FROM e{r} GROUP BY node)"
        )
        ctes.append(f"a{r} AS (SELECT node FROM d{r} WHERE c >= {k})")
        ctes.append(
            f"e{r + 1} AS MATERIALIZED (SELECT e.node, e.nbr FROM e{r} e "
            f"SEMI JOIN a{r} x ON e.node = x.node "
            f"SEMI JOIN a{r} y ON e.nbr = y.node)"
        )
    ctes.append(
        f"d{rounds} AS (SELECT node, COUNT(*) AS c "
        f"FROM e{rounds} GROUP BY node)"
    )
    return (
        f"WITH {_O_EDGES}, {', '.join(ctes)} "
        f"SELECT node, CAST(c AS BIGINT) AS core_deg "
        f"FROM d{rounds} WHERE c >= {k}"
    )


def kcore(spark: SparkSession, sf_dir: str, k: int = _K,
          rounds: int = _ROUNDS) -> DataFrame:
    """(node, core_deg) for every node of the k-core after ``rounds``
    synchronous peel rounds (exact k-core once fixpoint is reached —
    pinned on fixtures by tests/test_wave7.py)."""
    edges = _pagerank_sym_cached(spark, sf_dir)
    # r14: rounds past the fixpoint are skipped — the peel only REMOVES
    # edges, so an unchanged edge count proves the surviving edge set is
    # identical and every remaining unrolled round is the identity (the
    # answer is bit-identical to the full unroll).  At sf0.001 the peel
    # converges immediately (4 of 6 rounds skipped); at sf0.1 depth 5
    # means no round is skipped — which is why the count must be FREE:
    # the per-round checkpoint is lazy (eager=False) and count() is the
    # action that materializes it, so each round still runs exactly two
    # jobs (alive, edges) and the fixpoint witness costs no extra job.
    n_prev = None
    for _ in range(rounds):
        deg = edges.groupBy("node").agg(F.count(F.lit(1)).alias("c"))
        alive = deg.where(F.col("c") >= k).select("node").localCheckpoint()
        edges = (
            edges.join(alive, "node", "left_semi")
            .join(
                alive.withColumnRenamed("node", "nbr"), "nbr", "left_semi"
            )
            .select("node", "nbr")
            .localCheckpoint(eager=False)
        )
        n = materialize_count(edges)  # one job: checkpoint + witness
        if n == n_prev:
            break  # fixpoint reached: later rounds drop nothing
        n_prev = n
    return (
        edges.groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_deg"))
        .where(F.col("core_deg") >= k)
    )


@query("graph_kcore", oracle=_o_kcore_sql(_K, _ROUNDS))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph suite: the 2-core of the co-purchase graph (node +
    within-core degree) via synchronous distributed peeling — see
    module docstring for the shape and the fixed-unroll justification."""
    return kcore(spark, sf_dir)

"""Link prediction over the co-purchase graph (wave 17): neighborhood
Jaccard scoring of non-adjacent node pairs.

The classic unsupervised link-prediction baseline (Liben-Nowell &
Kleinberg 2003): score a candidate pair by the Jaccard similarity of
its neighborhoods, |N(u)∩N(v)| / |N(u)∪N(v)|.  In a training-data
platform this is the graph-side analog of embedding near-dup — which
entities are structurally the same node — and the feature a
crawl-prioritizer ranks candidate links by.

Exactness: common and union counts are integers, so the score is an
exact int64 fraction (emitted as num/den + one IEEE division) —
hash-checkable with no float anywhere, like `eval_cohens_kappa`.

Scale shape: candidates are generated ONLY through shared neighbors
(the wedge join on the pivot node — a pair with no common neighbor has
score 0 and is never materialized), so the cost is Σ_p C(deg(p), 2)
over pivot nodes, the same wedge bound as `graph_triangles` — never a
node cross-product (plan-gated).  Hub pivots are capped at
``_PIVOT_CAP``: a pivot with deg > cap contributes C(cap-th,2) wedges
at most by SKIPPING the pivot entirely — the standard hub-suppression
approximation (a shared super-hub neighbor carries ~no link signal;
TF-IDF's stopword argument applied to graphs).  The cap is applied
identically in both engines, so determinism survives.  Final top-k is
an orderBy+limit TakeOrderedAndProject; the rank window runs over the
k survivors only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.operators.graph_ops import _O_EDGES, copurchase_edges
from vector_ai_npm_spark.registry import query

_PIVOT_CAP = 128  # skip super-hub pivots (deg > cap) in wedge emission
_TOP_K = 50


@query(
    "graph_link_jaccard",
    oracle=f"""
    WITH {_O_EDGES},
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY node
    ),
    pivots AS (
      SELECT s.node AS pivot, s.nbr FROM sym s
      JOIN deg d ON d.node = s.node
      WHERE d.deg <= {_PIVOT_CAP}
    ),
    cand AS (
      SELECT a.nbr AS u, b.nbr AS v, CAST(COUNT(*) AS BIGINT) AS common
      FROM pivots a JOIN pivots b
        ON a.pivot = b.pivot AND a.nbr < b.nbr
      GROUP BY a.nbr, b.nbr
    ),
    nonedge AS (
      SELECT c.u, c.v, c.common FROM cand c
      LEFT JOIN edges e ON e.src = c.u AND e.dst = c.v
      WHERE e.src IS NULL
    ),
    scored AS (
      SELECT n.u, n.v, n.common,
             du.deg + dv.deg - n.common AS uni
      FROM nonedge n
      JOIN deg du ON du.node = n.u
      JOIN deg dv ON dv.node = n.v
    )
    SELECT u, v, common, uni,
           CAST(common AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT u, v, common, uni,
             ROW_NUMBER() OVER (
               ORDER BY CAST(common AS DOUBLE) / CAST(uni AS DOUBLE) DESC,
                        u ASC, v ASC
             ) AS rank
      FROM scored
    ) WHERE rank <= {_TOP_K}
    """,
)
def graph_link_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOP_K} non-adjacent pairs by neighborhood Jaccard — see
    module docstring.  One wedge join generates candidates, an anti
    join removes existing edges, two degree joins close the union
    count; the global top-k is TakeOrderedAndProject and the rank
    window sees k rows only."""
    edges = copurchase_edges(spark, sf_dir).select("src", "dst")
    sym = edges.select(
        F.col("src").alias("node"), F.col("dst").alias("nbr")
    ).unionAll(
        edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    )
    deg = sym.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    pivots = (
        sym.join(deg, "node")
        .where(F.col("deg") <= _PIVOT_CAP)
        .select(F.col("node").alias("pivot"), "nbr")
    )
    a = pivots.alias("a")
    b = pivots.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.pivot") == F.col("b.pivot"))
            & (F.col("a.nbr") < F.col("b.nbr")),
        )
        .groupBy(
            F.col("a.nbr").alias("u"), F.col("b.nbr").alias("v")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    nonedge = cand.join(
        edges,
        (cand.u == edges.src) & (cand.v == edges.dst),
        "left_anti",
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    scored = (
        nonedge.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common",
            (F.col("du") + F.col("dv") - F.col("common")).alias("uni"),
        )
    )
    jac = F.col("common").cast("double") / F.col("uni").cast("double")
    top = scored.orderBy(
        jac.desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(_TOP_K)
    w = Window.orderBy(jac.desc(), F.col("u").asc(), F.col("v").asc())
    return top.select(
        "u",
        "v",
        "common",
        "uni",
        jac.alias("jaccard"),
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


_RA_SCALE = 10**12  # fixed-point digits for the 1/deg(pivot) terms


@query(
    "graph_link_resource_alloc",
    oracle=f"""
    WITH {_O_EDGES},
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY node
    ),
    pivots AS (
      SELECT s.node AS pivot, s.nbr, d.deg AS pdeg FROM sym s
      JOIN deg d ON d.node = s.node
      WHERE d.deg <= {_PIVOT_CAP}
    ),
    cand AS (
      SELECT a.nbr AS u, b.nbr AS v,
             CAST(COUNT(*) AS BIGINT) AS common,
             CAST(SUM({_RA_SCALE} // a.pdeg) AS BIGINT) AS ra_e12
      FROM pivots a JOIN pivots b
        ON a.pivot = b.pivot AND a.nbr < b.nbr
      GROUP BY a.nbr, b.nbr
    ),
    nonedge AS (
      SELECT c.u, c.v, c.common, c.ra_e12 FROM cand c
      LEFT JOIN edges e ON e.src = c.u AND e.dst = c.v
      WHERE e.src IS NULL
    )
    SELECT u, v, common, ra_e12, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT u, v, common, ra_e12,
             ROW_NUMBER() OVER (
               ORDER BY ra_e12 DESC, u ASC, v ASC
             ) AS rank
      FROM nonedge
    ) WHERE rank <= {_TOP_K}
    """,
)
def graph_link_resource_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-allocation link scoring (Zhou, Lü & Zhang 2009):
    RA(u,v) = Σ_{{p ∈ N(u)∩N(v)}} 1/deg(p) — the degree-penalized
    common-neighbor index that consistently beats raw counts and
    Adamic-Adar in link-prediction benchmarks, and is EXACTLY
    computable (Adamic-Adar's 1/ln deg is not): each term rides the
    fixed-point long division ⌊10¹²/deg(p)⌋ (the `text_bm25_topk_contract`
    idiom), so the summed score, ranking and top-k are all
    hash-deterministic.  Same wedge-join candidate generation, hub cap
    and anti-join as `graph_link_jaccard` — the pivot degree is
    carried on the wedge row, so RA folds in the SAME aggregate that
    counts common neighbors (no extra join)."""
    edges = copurchase_edges(spark, sf_dir).select("src", "dst")
    sym = edges.select(
        F.col("src").alias("node"), F.col("dst").alias("nbr")
    ).unionAll(
        edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    )
    deg = sym.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    pivots = (
        sym.join(deg, "node")
        .where(F.col("deg") <= _PIVOT_CAP)
        .select(
            F.col("node").alias("pivot"), "nbr", F.col("deg").alias("pdeg")
        )
    )
    a = pivots.alias("a")
    b = pivots.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.pivot") == F.col("b.pivot"))
            & (F.col("a.nbr") < F.col("b.nbr")),
        )
        .groupBy(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("v"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common"),
            F.sum(F.expr(f"{_RA_SCALE} DIV a.pdeg"))
            .cast("bigint")
            .alias("ra_e12"),
        )
    )
    nonedge = cand.join(
        edges,
        (cand.u == edges.src) & (cand.v == edges.dst),
        "left_anti",
    )
    top = nonedge.orderBy(
        F.col("ra_e12").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(_TOP_K)
    w = Window.orderBy(
        F.col("ra_e12").desc(), F.col("u").asc(), F.col("v").asc()
    )
    return top.select(
        "u",
        "v",
        "common",
        "ra_e12",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )

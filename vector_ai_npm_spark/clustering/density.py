"""Wave 38a: grid-density clustering (cell-DBSCAN).

`cluster_grid_density` — the density-based member of the clustering
family (k-means and SemDeDup are centroid/threshold-based): project
embeddings onto their first two dimensions, bucket into an ε-grid,
classify cells DBSCAN-style (core = ≥ minPts points; border = non-core
adjacent to a core cell; noise = rest), and union 8-adjacent core
cells into clusters via min-label connected components.  This is the
GRID formulation of DBSCAN (the classic scale trick — e.g. Gunawan's
grid DBSCAN, and every distributed DBSCAN since): density decisions
ride per-cell COUNTS, so the corpus is touched exactly once by one
groupBy and everything after runs on the occupied-cell frame — bounded
by the grid extent (≤ ~100 cells here), not the corpus.

The 2-D projection is the honest fixture-scale choice (64-dim grid
cells are vacuous); a production pipeline would grid a learned 2-D
projection (UMAP/PCA) the same way — the CELL machinery is what's
under test.

Cross-engine determinism: cell keys are floor(x/ε) over identical
doubles; all counts integers; component labels are min cell keys
propagated to a fixed point (16 unrolled rounds in the oracle ≥ the
occupied-grid diameter; the Spark side runs min-label union-find on
the DRIVER over the collected core-cell frame — grid-extent-bounded
model state, never corpus-sized; distributed pointer-jumping on a
≤400-row frame was ~2 s of scheduler overhead, the r10/r11 bench
regression).  Border cells adjacent to several clusters tie-break to
the MIN cluster label in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_EPS = 0.1
_MIN_PTS = 8
_ROUNDS = 16  # ≥ occupied-grid diameter at any fixture scale
_KEY = "(cx + 100) * 1000 + (cy + 100)"  # single-int cell key


def _o_rounds() -> str:
    ctes = []
    for r in range(1, _ROUNDS + 1):
        ctes.append(f"""
    l{r} AS MATERIALIZED (
      SELECT l.v,
             LEAST(l.label, COALESCE(MIN(nl.label), l.label)) AS label
      FROM l{r - 1} l
      LEFT JOIN sym e ON e.s = l.v
      LEFT JOIN l{r - 1} nl ON nl.v = e.d
      GROUP BY l.v, l.label
    )""")
    return ",".join(ctes)


@query(
    "cluster_grid_density",
    oracle=f"""
    WITH cells AS MATERIALIZED (
      SELECT CAST(FLOOR(CAST(embedding[1] AS DOUBLE) / {_EPS}) AS BIGINT)
               AS cx,
             CAST(FLOOR(CAST(embedding[2] AS DOUBLE) / {_EPS}) AS BIGINT)
               AS cy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings GROUP BY 1, 2
    ),
    core AS MATERIALIZED (
      SELECT {_KEY} AS cell, cx, cy, n FROM cells WHERE n >= {_MIN_PTS}
    ),
    pairs AS (
      SELECT a.cell AS s, b.cell AS d
      FROM core a JOIN core b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       AND a.cell <> b.cell
    ),
    sym AS MATERIALIZED (SELECT s, d FROM pairs),
    l0 AS MATERIALIZED (SELECT cell AS v, cell AS label FROM core),
    {_o_rounds()},
    comp AS MATERIALIZED (SELECT v AS cell, label AS cluster_id FROM l{_ROUNDS}),
    clusters AS (
      SELECT c.cluster_id,
             CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(SUM(k.n) AS BIGINT) AS n_core_points
      FROM comp c JOIN core k ON k.cell = c.cell
      GROUP BY c.cluster_id
    ),
    border AS (
      SELECT b.cx, b.cy, b.n,
             MIN(c.cluster_id) AS cluster_id
      FROM cells b
      JOIN core k ON abs(b.cx - k.cx) <= 1 AND abs(b.cy - k.cy) <= 1
      JOIN comp c ON c.cell = k.cell
      WHERE b.n < {_MIN_PTS}
      GROUP BY b.cx, b.cy, b.n
    ),
    border_per_cluster AS (
      SELECT cluster_id, CAST(SUM(n) AS BIGINT) AS n_border_points
      FROM border GROUP BY cluster_id
    ),
    noise AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_points
      FROM cells b
      WHERE b.n < {_MIN_PTS}
        AND NOT EXISTS (
          SELECT 1 FROM core k
          WHERE abs(b.cx - k.cx) <= 1 AND abs(b.cy - k.cy) <= 1
        )
    )
    SELECT c.cluster_id, c.n_cells, c.n_core_points,
           CAST(COALESCE(bp.n_border_points, 0) AS BIGINT)
             AS n_border_points
    FROM clusters c LEFT JOIN border_per_cluster bp
      ON bp.cluster_id = c.cluster_id
    UNION ALL
    SELECT CAST(-1 AS BIGINT), n_cells, CAST(0 AS BIGINT), n_points
    FROM noise
    """,
)
def cluster_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-DBSCAN over the 2-D embedding projection — see module
    docstring.  One corpus scan (the cell groupBy); every later frame
    is occupied-cell-bounded."""
    emb = load_table(spark, sf_dir, "embeddings")
    cells = (
        emb.select(
            F.floor(
                F.element_at("embedding", 1).cast("double") / _EPS
            ).alias("cx"),
            F.floor(
                F.element_at("embedding", 2).cast("double") / _EPS
            ).alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    core = cells.where(F.col("n") >= _MIN_PTS).select(
        F.expr(_KEY).alias("cell"), "cx", "cy", "n"
    )
    # component labeling runs driver-side: the core-cell frame is
    # bounded by the GRID EXTENT ((range/eps)² ≈ 400 cells for unit-
    # normalized embeddings), never by the corpus — the same bounded-
    # model-state contract as the k-means centroid collect
    # (clustering/queries.py).  Distributed pointer-jumping on a
    # ≤400-row frame was pure scheduler overhead (~2 s of tiny jobs —
    # the r10/r11 cluster_grid_density regression); union-find over
    # the collected cells is exact and instant, and the corpus is
    # still touched exactly once (the cell groupBy above).
    core_rows = core.select("cell", "cx", "cy").collect()
    by_pos = {(r.cx, r.cy): r.cell for r in core_rows}
    parent = {r.cell: r.cell for r in core_rows}

    def _find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (cx, cy), cell in by_pos.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = by_pos.get((cx + dx, cy + dy))
                if nb is not None and nb != cell:
                    ra, rb = _find(cell), _find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    # min cell key per component = the oracle's min-label fixed point
    roots: dict[int, int] = {}
    for cell in parent:
        r = _find(cell)
        roots[r] = min(roots.get(r, r), cell)
    comp = spark.createDataFrame(
        [(cell, roots[_find(cell)]) for cell in parent],
        "cell bigint, cid bigint",
    )
    comp_cells = core.join(F.broadcast(comp), "cell")
    clusters = comp_cells.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("n").cast("bigint").alias("n_core_points"),
    )
    non_core = cells.where(F.col("n") < _MIN_PTS)
    adj = non_core.join(
        comp_cells.select(
            F.col("cx").alias("kx"), F.col("cy").alias("ky"), "cid"
        ),
        (F.abs(F.col("cx") - F.col("kx")) <= 1)
        & (F.abs(F.col("cy") - F.col("ky")) <= 1),
        "left",
    )
    border = (
        adj.where(F.col("cid").isNotNull())
        .groupBy("cx", "cy", "n")
        .agg(F.min("cid").alias("cluster_id"))
    )
    border_per_cluster = border.groupBy("cluster_id").agg(
        F.sum("n").cast("bigint").alias("n_border_points")
    )
    noise = (
        adj.groupBy("cx", "cy", "n")
        .agg(F.max("cid").alias("any_cid"))
        .where(F.col("any_cid").isNull())
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias(
                "n_points"
            ),
        )
    )
    out = clusters.join(border_per_cluster, "cluster_id", "left").select(
        "cluster_id",
        "n_cells",
        "n_core_points",
        F.coalesce("n_border_points", F.lit(0)).cast("bigint").alias(
            "n_border_points"
        ),
    )
    return out.unionByName(
        noise.select(
            F.lit(-1).cast("bigint").alias("cluster_id"),
            F.col("n_cells"),
            F.lit(0).cast("bigint").alias("n_core_points"),
            F.col("n_points").alias("n_border_points"),
        )
    )

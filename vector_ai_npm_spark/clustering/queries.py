"""Embedding-space k-means + semantic dedup (SemDeDup-style).

North-star LLM-pipeline operators: cluster the corpus embedding space
with Lloyd's k-means, then prune semantic near-duplicates *within*
clusters only — the SemDeDup recipe (Abbas et al. 2023, arXiv
2303.09540) that bounds the quadratic pair term by cluster size instead
of corpus size. The reference has no clustering surface (its similarity
path is a per-query pgvector top-k, vector-client.ts:396-415); this is
the batch-corpus extension of that embedding column.

Scale design (100 TB):

* Assignment is a **map-only stage**: centroids are driver-held model
  state (k x dim doubles — identical in kind to the PQ codebooks in
  retrieval/pq.py), embedded as literal arrays, so each Lloyd step is
  one scan + one k*dim-row centroid aggregate. No per-row join against
  a centroid table, no shuffle of the embedding payload.
* The centroid update aggregates (cluster, dim) cells — k*dim rows of
  shuffle state regardless of corpus size — using the exact-decimal
  mean (functions.numeric.davg_grid — tie-free integer grid, the r11
  sf1 dyadic-tie lesson) so both engines produce bit-identical
  centroids and the driver's value-hash compare stays exact.
* SemDeDup's pair join is an equi-join on cluster_id with vec_id_a <
  vec_id_b: per-cluster quadratic, corpus-linear when k scales with n
  (k ~ n/target_cluster_size keeps cluster sizes bounded; the paper
  uses k = 11k for 300M docs). The embedding payload joins only within
  clusters — never a corpus-wide cross product (plan-gated).

Determinism for the oracle: seeds are the k lowest vec_ids, argmin
ties break toward the lower cluster id (struct-min in Spark ==
ROW_NUMBER ORDER BY d, cid in DuckDB), and every float fold is a
strict left fold in array order (functions.vectors conventions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.numeric import davg_grid, o_davg_grid
from vector_ai_npm_spark.functions.vectors import cosine_similarity, o_cosine
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

K = 8
SEMDEDUP_TAU = 0.4  # fixture vectors are near-orthogonal (max in-block
# cosine ~0.47, FIXTURES.md) — production runs ~0.95; the recall
# contract below pins the high-threshold behavior on planted pairs.
_PLANT_OFFSET = 1_000_000


# --------------------------------------------------------------------------
# shared k-means core (Spark side)
# --------------------------------------------------------------------------


def _sqdist_to_lit(emb: Column, centroid: list[float]) -> Column:
    """||x - c||^2 as a strict left fold against a literal centroid."""
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    diffs = F.zip_with(emb, lit, lambda x, c: (x - c) * (x - c))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def _assign(df: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Nearest-centroid assignment, ties to the lower cluster id.

    array_min over struct(dist, cid) compares lexicographically —
    exactly ROW_NUMBER() ... ORDER BY d, cid in the oracle.
    """
    cands = F.array(*[
        F.struct(
            _sqdist_to_lit(F.col("emb"), c).alias("d"),
            F.lit(i).alias("cid"),
        )
        for i, c in enumerate(centroids)
    ])
    best = F.array_min(cands)
    return df.withColumn("cluster_id", best["cid"].cast("long")).withColumn(
        "sq_dist", best["d"]
    )


def kmeans_assign(emb: DataFrame, k: int = K) -> DataFrame:
    """Two Lloyd steps over (vec_id, emb array<double>): seed-assign,
    exact-decimal centroid update, re-assign.

    Driver-held model state only: one k-row collect (seeds) + one
    k*dim-row collect (updated centroids). Each assignment is map-only.
    """
    seeds_rows = (
        emb.where(F.col("vec_id") < k)
        .select("vec_id", "emb")
        .orderBy("vec_id")
        .collect()
    )
    seeds = [[float(v) for v in r.emb] for r in seeds_rows]
    a1 = _assign(emb, seeds)
    upd = (
        a1.select("cluster_id", F.posexplode("emb").alias("dim", "v"))
        .groupBy("cluster_id", "dim")
        .agg(davg_grid("v", "cv"))
        .collect()
    )
    cents: dict[int, dict[int, float]] = {}
    for r in upd:
        cents.setdefault(int(r.cluster_id), {})[int(r.dim)] = float(r.cv)
    dim = len(seeds[0])
    centroids = [
        [cents[c][d] for d in range(dim)] if c in cents else seeds[c]
        for c in range(k)
    ]
    return _assign(emb, centroids)


def _emb_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )


# --------------------------------------------------------------------------
# shared k-means oracle (DuckDB side)
# --------------------------------------------------------------------------


def _o_sqdist(x: str, c: str) -> str:
    """DuckDB mirror of _sqdist_to_lit's left fold, same op order."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({x}, {c}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
        f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), "
        f"(acc, v) -> acc + v)"
    )


def _o_kmeans_ctes(base: str, k: int = K) -> str:
    """CTE chain ending in a2(vec_id, cid, d): the 2-step Lloyd mirror.

    ``base`` must expose vec_id + embedding. Seeds are vec_id < k of
    the ORIGINAL corpus (planted ids sit above _PLANT_OFFSET).
    """
    return f"""
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM {base}),
    seeds AS (SELECT CAST(vec_id AS INT) AS cid, emb AS c
              FROM e WHERE vec_id < {k}),
    d1 AS (SELECT e.vec_id, s.cid, {_o_sqdist('e.emb', 's.c')} AS d
           FROM e CROSS JOIN seeds s),
    a1 AS (SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY d, cid) AS rn
             FROM d1) WHERE rn = 1),
    cells AS (SELECT a1.cid, r.i AS dim, e.emb[r.i] AS v
              FROM a1 JOIN e USING (vec_id)
              CROSS JOIN UNNEST(range(1, len(e.emb) + 1)) AS r(i)),
    cent AS (SELECT cid, dim, {o_davg_grid('v')} AS cv
             FROM cells GROUP BY cid, dim),
    c2 AS (SELECT cid, list(cv ORDER BY dim) AS c FROM cent GROUP BY cid),
    d2 AS (SELECT e.vec_id, c2.cid, {_o_sqdist('e.emb', 'c2.c')} AS d
           FROM e CROSS JOIN c2),
    a2 AS (SELECT vec_id, cid, d FROM (
             SELECT vec_id, cid, d,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY d, cid) AS rn
             FROM d2) WHERE rn = 1)
    """


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


@query(
    "cluster_kmeans_assign",
    oracle=f"""
    WITH {_o_kmeans_ctes('embeddings')}
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, d AS sq_dist
    FROM a2
    """,
)
def cluster_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star: Lloyd k-means (k=8, 2 steps) over the embedding
    column — the clustering pass SemDeDup/SemDeDup-style curation runs
    before within-cluster pruning. Map-only assignment against
    driver-held literal centroids; k*dim-cell exact-decimal update."""
    return kmeans_assign(_emb_frame(spark, sf_dir)).select(
        "vec_id", "cluster_id", "sq_dist"
    )


# r12 (sf10 catch, the mine_bitext/kendall bounded-subset precedent):
# with FIXED k=8 the intra-cluster pair join is n²/8 — 2.5e9 cosines at
# 200k vectors blew the sweep budget (production SemDeDup scales k with
# n, but a static oracle SQL cannot, so the exact face is bounded
# instead).  The subset keeps the k seed rows (vec_id < K) plus the
# md5-top-(CAP−K) of the rest — a no-op through sf1 (20k rows), so
# sf0.01/0.1/1 results are bit-identical.
_SEMDEDUP_SUBSET_CAP = 20_000

_SEMDEDUP_BASE_SQL = f"""(
    SELECT vec_id, embedding FROM embeddings WHERE vec_id < {K}
    UNION ALL
    SELECT vec_id, embedding FROM (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {K}
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
      LIMIT {_SEMDEDUP_SUBSET_CAP - K}
    ))"""


def _semdedup_subset(emb: DataFrame) -> DataFrame:
    """Spark mirror of _SEMDEDUP_BASE_SQL (same rows, any order)."""
    seeds = emb.where(F.col("vec_id") < K)
    rest = (
        emb.where(F.col("vec_id") >= K)
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(_SEMDEDUP_SUBSET_CAP - K)
    )
    return seeds.unionByName(rest)


@query(
    "dedup_semantic",
    oracle=f"""
    WITH {_o_kmeans_ctes(_SEMDEDUP_BASE_SQL)},
    ae AS (SELECT a2.vec_id, a2.cid, e.emb
           FROM a2 JOIN e USING (vec_id)),
    dropped AS (SELECT DISTINCT b.vec_id
                FROM ae a JOIN ae b
                  ON a.cid = b.cid AND a.vec_id < b.vec_id
                WHERE {o_cosine('a.emb', 'b.emb')} >= {SEMDEDUP_TAU})
    SELECT ae.vec_id, CAST(ae.cid AS BIGINT) AS cluster_id,
           (dropped.vec_id IS NULL) AS is_kept
    FROM ae LEFT JOIN dropped USING (vec_id)
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star SemDeDup: drop x when a lower-id same-cluster row
    sits within cosine >= tau of it (one-pass pair-dominance policy —
    parallel-safe, equal to the paper's greedy scan when near-dup
    classes are cliques, which holds at production tau ~0.95).

    Shuffle budget: the pair join is an equi-join on cluster_id
    (plan-gated no-cross-product); cluster sizes bound the quadratic
    term, and k grows with n in production so the bound is a constant.
    This exact face pins k=8, so it is bounded to the deterministic
    seed-preserving md5 subset above sf1 (see _SEMDEDUP_SUBSET_CAP).
    """
    assigned = kmeans_assign(_semdedup_subset(_emb_frame(spark, sf_dir)))
    a = assigned.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("cluster_id").alias("cid_a"),
        F.col("emb").alias("emb_a"),
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("cluster_id").alias("cid_b"),
        F.col("emb").alias("emb_b"),
    )
    dropped = (
        a.join(
            b,
            (F.col("cid_a") == F.col("cid_b"))
            & (F.col("vec_id_a") < F.col("vec_id_b")),
        )
        .where(
            cosine_similarity(F.col("emb_a"), F.col("emb_b"))
            >= F.lit(SEMDEDUP_TAU)
        )
        .select(F.col("vec_id_b").alias("vec_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        assigned.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.col("_dropped").isNull().alias("is_kept"),
        )
    )


_PLANTED_BASE_SQL = f"""(
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + {_PLANT_OFFSET} AS vec_id,
           list_prepend(CAST(embedding[1] AS DOUBLE) + CAST(0.001 AS DOUBLE),
                        CAST(embedding[2:len(embedding)] AS DOUBLE[]))
             AS embedding
    FROM embeddings)"""


@query(
    "semdedup_recall",
    oracle=f"""
    WITH {_o_kmeans_ctes(_PLANTED_BASE_SQL)},
    ae AS (SELECT a2.vec_id, a2.cid, e.emb FROM a2 JOIN e USING (vec_id)),
    caught AS (SELECT COUNT(*) AS n_caught
               FROM ae a JOIN ae b
                 ON a.cid = b.cid
                AND b.vec_id = a.vec_id + {_PLANT_OFFSET}
               WHERE {o_cosine('a.emb', 'b.emb')} >= 0.95),
    n AS (SELECT COUNT(*) AS n_planted FROM embeddings)
    SELECT CAST(n.n_planted AS BIGINT) AS n_planted,
           CAST(caught.n_caught AS BIGINT) AS n_caught,
           (CAST(caught.n_caught AS DOUBLE)
              >= 0.95 * CAST(n.n_planted AS DOUBLE)) AS recall_ok
    FROM n CROSS JOIN caught
    """,
)
def semdedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup recall contract (the lsh_dedup_recall pattern): plant
    one near-identical copy per vector (first element + 0.001 — cosine
    ~0.9999), rerun the full cluster+pair pipeline at production tau
    0.95, and pin that >= 95% of planted pairs are co-clustered and
    caught. A regression in seeding, the distance fold, tie-breaks, or
    the pair join flips recall_ok -> red driver row. Both engines run
    the identical arithmetic, so the measured value is deterministic.
    """
    emb = _emb_frame(spark, sf_dir)
    planted = emb.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"),
        F.expr(
            "concat(array(emb[0] + 0.001d), slice(emb, 2, size(emb) - 1))"
        ).alias("emb"),
    )
    assigned = kmeans_assign(emb.unionByName(planted))
    a = assigned.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("cluster_id").alias("cid_a"),
        F.col("emb").alias("emb_a"),
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("cluster_id").alias("cid_b"),
        F.col("emb").alias("emb_b"),
    )
    caught = (
        a.join(
            b,
            (F.col("cid_a") == F.col("cid_b"))
            & (F.col("vec_id_b") == F.col("vec_id_a") + _PLANT_OFFSET),
        )
        .where(
            cosine_similarity(F.col("emb_a"), F.col("emb_b")) >= F.lit(0.95)
        )
        .agg(F.count(F.lit(1)).alias("n_caught"))
    )
    n = emb.agg(F.count(F.lit(1)).alias("n_planted"))
    return n.join(caught, how="cross").select(
        F.col("n_planted"),
        F.col("n_caught"),
        (
            F.col("n_caught").cast("double")
            >= F.lit(0.95) * F.col("n_planted").cast("double")
        ).alias("recall_ok"),
    )

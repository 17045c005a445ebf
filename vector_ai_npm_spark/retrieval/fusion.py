"""Hybrid-retrieval fusion + whitening (wave 3).

Two retrieval-infrastructure operators the reference's single-ranker
client (vector-client.ts:396-415 — one pgvector cosine list) never
needed but every production RAG stack grows into:

* `retrieval_fusion_rrf` — Reciprocal Rank Fusion (Cormack et al.,
  SIGIR 2009): combine two retrievers' rankings by summed reciprocal
  rank, the standard hybrid-search merge (vector + keyword, or cheap +
  expensive ranker).  The two rankers here are the full 64-dim cosine
  and a truncated 16-dim cosine (the cheap-prefilter proxy, same shape
  as a Matryoshka-embedding first stage).  Scores are INTEGER
  reciprocal ranks — ``10^6 div (60 + rank)`` — because IEEE summation
  of 1/(60+r) is benign but the integer form is bit-identical by
  construction in both engines (the lift_ppm decision).
* `vector_whiten` — PCA whitening (the ZCA/OPQ preprocessing step:
  decorrelate + unit-variance each component before quantization or
  cosine calibration).  Like `vector_pca_project` the model floats are
  driver-scale and engine-local, so the driver-facing face is the
  contract-boolean frame: whitened covariance ≈ I is the definition of
  whitening and is checked distributively.

Scale shape: RRF's base is the same broadcast-queries NLJ as
`join_similarity` — both rankings are windows over ONE scan of the
store (per-query state = top-k); the fuse is a full-outer join of two
k-row-per-query lists.  Whitening is one distributed covariance
(O(dim²) state) + driver eigen-work + a map-only projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.vectors import (
    cosine_similarity,
    o_cosine,
)
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_QUERY_IDS = (0, 7, 42)   # FIXTURES.md §3 convention
_K_CAND = 20              # per-ranker candidate depth
_K_OUT = 10               # fused results per query
_RRF_K = 60               # the SIGIR-2009 constant
_TRUNC = 16               # cheap ranker: first 16 of 64 dims


def _o_trunc(expr: str) -> str:
    return f"list_slice({expr}, 1, {_TRUNC})"


def _o_ranked(sim_expr: str, alias: str) -> str:
    """One ranker's top-N CTE body (rank over each query's candidates)."""
    return f"""
      SELECT q.vec_id AS q_vec_id, e.vec_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {sim_expr} DESC, e.vec_id ASC) AS BIGINT) AS {alias}
      FROM embeddings e
      CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id IN {_QUERY_IDS}) q
      QUALIFY {alias} <= {_K_CAND}
    """


@query(
    "retrieval_fusion_rrf",
    oracle=f"""
    WITH full_rank AS ({_o_ranked(o_cosine('e.embedding', 'q.embedding'), 'rank_full')}),
    trunc_rank AS ({_o_ranked(o_cosine(_o_trunc('e.embedding'), _o_trunc('q.embedding')), 'rank_trunc')}),
    fused AS (
      SELECT COALESCE(f.q_vec_id, t.q_vec_id) AS q_vec_id,
             COALESCE(f.vec_id, t.vec_id) AS vec_id,
             COALESCE(1000000 // ({_RRF_K} + f.rank_full), 0)
               + COALESCE(1000000 // ({_RRF_K} + t.rank_trunc), 0)
               AS rrf_score
      FROM full_rank f
      FULL OUTER JOIN trunc_rank t
        ON f.q_vec_id = t.q_vec_id AND f.vec_id = t.vec_id
    )
    SELECT q_vec_id, vec_id, CAST(rrf_score AS BIGINT) AS rrf_score,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY q_vec_id
             ORDER BY rrf_score DESC, vec_id ASC) AS BIGINT) AS fused_rank
    FROM fused
    QUALIFY fused_rank <= {_K_OUT}
    """,
)
def retrieval_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9+: RRF hybrid fusion of the exact 64-dim ranking and the
    truncated 16-dim ranking, integer reciprocal-rank scores, top-10
    fused per query — see module docstring."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    base = emb.select("vec_id", "embedding").crossJoin(F.broadcast(queries))

    def ranked(sim: F.Column, alias: str) -> DataFrame:
        w = Window.partitionBy("q_vec_id").orderBy(
            F.desc("sim"), F.col("vec_id")
        )
        return (
            base.withColumn("sim", sim)
            .withColumn(alias, F.row_number().over(w).cast("long"))
            .where(F.col(alias) <= _K_CAND)
            .select("q_vec_id", "vec_id", alias)
        )

    trunc = lambda c: F.slice(F.col(c), 1, _TRUNC)  # noqa: E731
    full_rank = ranked(
        cosine_similarity(F.col("embedding"), F.col("q_embedding")),
        "rank_full",
    )
    trunc_rank = ranked(
        cosine_similarity(trunc("embedding"), trunc("q_embedding")),
        "rank_trunc",
    )
    fused = full_rank.join(
        trunc_rank, ["q_vec_id", "vec_id"], "full_outer"
    ).select(
        "q_vec_id",
        "vec_id",
        (
            F.coalesce(
                F.expr(f"1000000 div ({_RRF_K} + rank_full)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 div ({_RRF_K} + rank_trunc)"), F.lit(0)
            )
        ).cast("long").alias("rrf_score"),
    )
    wf = Window.partitionBy("q_vec_id").orderBy(
        F.desc("rrf_score"), F.col("vec_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .where(F.col("fused_rank") <= _K_OUT)
    )


@query(
    "vector_whiten",
    oracle="""
    SELECT * FROM (VALUES
      ('rows_preserved', TRUE), ('whitened_dim', TRUE),
      ('unit_variance', TRUE), ('decorrelated', TRUE),
      ('basis_scaled', TRUE)
    ) t(scope, ok)
    """,
)
def vector_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA whitening contract (64 → 8 whitened dims): project onto the
    top-8 principal axes and scale each coordinate by 1/√λᵢ so the
    output has identity covariance — the ZCA/OPQ preprocessing step.

      * rows_preserved / whitened_dim — every store row maps to an
        8-dim whitened vector;
      * unit_variance — each whitened component's sample variance is
        1 ± 1e-6 (the definition of whitening);
      * decorrelated — off-diagonal whitened covariance ≤ 1e-6;
      * basis_scaled — the scaled basis columns have norm 1/√λᵢ.

    Cost: one distributed covariance (O(dim²) shuffle state via MLlib's
    PCA Gramian), driver 64×64 eigen-work, then a map-only projection —
    corpus-size independent training, scan-speed application.  The
    model floats are engine-local (the vector_pca_project decision), so
    the driver face is the contract-boolean frame; the numeric checks
    run distributed and land here as booleans."""
    import numpy as np
    from pyspark.ml.feature import PCA as MLPCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    k = 8
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "features"
        ),
    )
    n = vecs.count()
    model = MLPCA(k=k, inputCol="features", outputCol="pca").fit(vecs)
    proj = model.transform(vecs).select(
        "vec_id", vector_to_array(F.col("pca")).alias("p")
    )
    # per-component variance of the projection = the PCA eigenvalues;
    # estimate them distributively (sample covariance, ddof=1 to match
    # MLlib) and whiten by 1/sqrt(var)
    comp = proj.select(
        "vec_id", F.posexplode("p").alias("dim", "v")
    )
    stats = (
        comp.groupBy("dim")
        .agg(
            F.avg("v").alias("mu"),
            (
                (F.sum(F.col("v") * F.col("v"))
                 - F.count(F.lit(1)) * F.avg("v") * F.avg("v"))
                / (F.count(F.lit(1)) - 1)
            ).alias("var"),
        )
        .collect()
    )
    scale = {r["dim"]: 1.0 / float(np.sqrt(r["var"])) for r in stats}
    mu = {r["dim"]: float(r["mu"]) for r in stats}
    scale_arr = F.array(*[F.lit(scale[d]) for d in range(k)])
    mu_arr = F.array(*[F.lit(mu[d]) for d in range(k)])
    white = proj.select(
        "vec_id",
        F.zip_with(
            F.zip_with("p", mu_arr, lambda x, m: x - m),
            scale_arr,
            lambda x, s: x * s,
        ).alias("w"),
    )
    wcomp = white.select(F.posexplode("w").alias("dim", "v"))
    wstats = (
        wcomp.groupBy("dim")
        .agg(
            (
                (F.sum(F.col("v") * F.col("v"))
                 - F.count(F.lit(1)) * F.avg("v") * F.avg("v"))
                / (F.count(F.lit(1)) - 1)
            ).alias("var")
        )
        .collect()
    )
    unit_var = bool(
        all(abs(r["var"] - 1.0) <= 1e-6 for r in wstats)
    )
    # off-diagonal covariance via the pairwise sums over the 8-dim frame
    pairs = white.select(
        *[F.col("w")[i].alias(f"w{i}") for i in range(k)]
    )
    cov_exprs = []
    for i in range(k):
        for j in range(i + 1, k):
            cov_exprs.append(
                (
                    F.sum(F.col(f"w{i}") * F.col(f"w{j}")) / (n - 1)
                ).alias(f"c_{i}_{j}")
            )
    cov_row = pairs.agg(*cov_exprs).first()
    decorrelated = bool(all(abs(v) <= 1e-6 for v in cov_row))
    n_out, dmin, dmax = white.agg(
        F.count(F.lit(1)), F.min(F.size("w")), F.max(F.size("w"))
    ).first()
    P = model.pc.toArray()
    basis_scaled = bool(
        np.allclose(
            np.linalg.norm(P * np.array([scale[d] for d in range(k)]), axis=0),
            [scale[d] for d in range(k)],
            rtol=1e-9,
        )
    )
    flags = [
        ("rows_preserved", bool(n_out == n)),
        ("whitened_dim", bool(dmin == k and dmax == k)),
        ("unit_variance", unit_var),
        ("decorrelated", decorrelated),
        ("basis_scaled", basis_scaled),
    ]
    return spark.createDataFrame(flags, "scope string, ok boolean")

"""Mean average precision for retrieval (wave 19).

`retrieval_eval_map` — AP@10 per query over the same label-match
relevance ranking as `retrieval_eval_ndcg` (whose row already carries
recall@k and reciprocal rank; this face adds the third classic TREC
metric).  AP is the area under the precision-recall curve the way
TREC computes it: AP@K = Σ_{k≤K, rel_k=1} P@k / min(R, K).

Exactness (the reason AP gets its own face instead of riding the
ndcg one, which needs a log-discount literal table): with K = 10,
every P@k = hits_k/k has denominator ≤ 10, so multiplying through by
L = lcm(1..10) = 2520 clears ALL of them —
ap_num = Σ rel_k·hits_k·(2520 DIV k) is an exact integer and
ap_den = 2520·min(R, K) — per-query AP is an exact int64 fraction
(num/den emitted + one division).  Downstream macro-averages the
per-query rows (MAP) however it likes; the exact fractions survive
the trip.  No ln, no float folds.

Scale: same shape as retrieval_eval_ndcg — query batch broadcasts,
one per-query rank window, per-query state is top-k.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.vectors import o_cosine
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_K = 10
_L = 2520  # lcm(1..10)
_QUERY_IDS = (0, 7, 42)


@query(
    "retrieval_eval_map",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    q AS (SELECT vec_id AS q_vec_id, label AS q_label, emb AS q_emb
          FROM e WHERE vec_id IN {_QUERY_IDS}),
    s AS (SELECT q.q_vec_id,
                 CASE WHEN e.label = q.q_label THEN 1 ELSE 0 END AS rel,
                 ROW_NUMBER() OVER (
                   PARTITION BY q.q_vec_id
                   ORDER BY {o_cosine('e.emb', 'q.q_emb')} DESC,
                            e.vec_id) AS rank
          FROM e CROSS JOIN q
          WHERE e.vec_id <> q.q_vec_id),
    h AS (SELECT q_vec_id, rank, rel,
                 CAST(SUM(rel) OVER (
                   PARTITION BY q_vec_id ORDER BY rank
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS hits
          FROM s),
    g AS (SELECT q_vec_id,
                 CAST(SUM(rel) AS BIGINT) AS n_rel,
                 CAST(SUM(CASE WHEN rank <= {_K} AND rel = 1
                               THEN hits * ({_L} // rank) ELSE 0 END)
                      AS BIGINT) AS ap_num
          FROM h GROUP BY q_vec_id)
    SELECT q_vec_id, n_rel, ap_num,
           CAST({_L} * LEAST(n_rel, {_K}) AS BIGINT) AS ap_den,
           CAST(ap_num AS DOUBLE)
             / CAST({_L} * LEAST(n_rel, {_K}) AS DOUBLE) AS ap_at_k
    FROM g
    """,
)
def retrieval_eval_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AP@10 per query as an exact integer fraction — see module
    docstring.  The running hit count rides the per-query rank window
    (top-k state only); the lattice term hits_k·(2520/k) is integer."""
    from vector_ai_npm_spark.functions.vectors import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    q = emb.where(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("label").alias("q_label"),
        F.col("emb").alias("q_emb"),
    )
    cand = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            "vec_id",
            cosine_similarity(F.col("emb"), F.col("q_emb")).alias("sim"),
            (F.col("label") == F.col("q_label")).cast("int").alias("rel"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = cand.select(
        "q_vec_id",
        "rel",
        F.row_number().over(w).alias("rank"),
        F.sum("rel").over(wcum).cast("bigint").alias("hits"),
    )
    term = F.when(
        (F.col("rank") <= _K) & (F.col("rel") == 1),
        F.col("hits") * F.expr(f"{_L} DIV rank"),
    ).otherwise(F.lit(0))
    g = ranked.groupBy("q_vec_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel"),
        F.sum(term).cast("bigint").alias("ap_num"),
    )
    den = (F.lit(_L) * F.least(F.col("n_rel"), F.lit(_K))).cast("bigint")
    return g.select(
        "q_vec_id",
        "n_rel",
        "ap_num",
        den.alias("ap_den"),
        (F.col("ap_num").cast("double") / den.cast("double")).alias(
            "ap_at_k"
        ),
    )


assert reduce(math.lcm, range(1, _K + 1)) == _L

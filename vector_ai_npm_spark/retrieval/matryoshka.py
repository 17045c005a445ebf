"""Matryoshka (MRL) dimension-truncation recall (wave 9).

Matryoshka Representation Learning (Kusupati et al. 2022) trains
embeddings whose PREFIX dims are themselves usable embeddings, so
serving systems rank with the first 16-of-64 dims (4× less compute and
memory bandwidth) and re-rank survivors at full width.  Before flipping
that switch, the pipeline needs exactly this measurement: top-k recall
of prefix-dim ranking against full-width ranking, per query.

`vector_matryoshka_recall` computes both rankings in ONE pass: the
query×corpus pair frame is materialized once (3 broadcast query rows ×
corpus scan), each pair evaluates cos₆₄ and cos₁₆ side by side in the
same whole-stage-codegen projection, and two rank windows over the SAME
per-query partition (one Exchange, two in-partition sorts) produce both
top-10 sets.  Recall = |top10₆₄ ∩ top10₁₆| / 10 falls out of a
conditional count — no self-join of two separately-ranked branches
(which would scan the corpus twice and shuffle twice).

Scale design (100 TB): cost ≡ one `join_similarity` (scan-bound pair
scoring + per-query top-k); the truncated cosine adds 25% more
multiplies inside the same codegen loop, not a second pass.  For
corpus-scale query sets, the same plan applies downstream of an ANN
shortlist (similarity_search_ann) instead of the full cross product.

Float discipline: cosines use the repo's strict left-fold dot product
(functions/vectors.py) — bit-identical cross-engine — and only ranks
and the exact count-ratio recall are emitted, never raw float scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.vectors import cosine_similarity, o_cosine
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_QUERY_IDS = (0, 7, 42)   # the retrieval-suite fixture queries
_PREFIX = 16
_K = 10


@query(
    "vector_matryoshka_recall",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_vec_id, embedding AS q_emb FROM embeddings
      WHERE vec_id IN {tuple(_QUERY_IDS)}
    ), s AS (
      SELECT q.q_vec_id, e.vec_id,
             {o_cosine('e.embedding', 'q.q_emb')} AS c64,
             {o_cosine(f'e.embedding[1:{_PREFIX}]',
                       f'q.q_emb[1:{_PREFIX}]')} AS c16
      FROM embeddings e CROSS JOIN q
    ), r AS (
      SELECT q_vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                ORDER BY c64 DESC, vec_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                ORDER BY c16 DESC, vec_id) AS rt
      FROM s
    )
    SELECT q_vec_id,
           CAST(SUM(CASE WHEN rf <= {_K} AND rt <= {_K} THEN 1 ELSE 0 END)
                AS DOUBLE) / {_K} AS recall
    FROM r GROUP BY q_vec_id
    """,
)
def vector_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 recall of 16-dim-prefix ranking vs full 64-dim ranking,
    per fixture query — one corpus pass, two rank windows over one
    Exchange (see module docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.where(F.col("vec_id").isin(*_QUERY_IDS)).select(
            F.col("vec_id").alias("q_vec_id"),
            F.col("embedding").alias("q_emb"),
        )
    )
    pairs = emb.crossJoin(q).select(
        "q_vec_id",
        "vec_id",
        cosine_similarity(F.col("embedding"), F.col("q_emb")).alias("c64"),
        cosine_similarity(
            F.slice("embedding", 1, _PREFIX), F.slice("q_emb", 1, _PREFIX)
        ).alias("c16"),
    )
    wq = Window.partitionBy("q_vec_id")
    ranked = pairs.select(
        "q_vec_id",
        F.row_number().over(wq.orderBy(F.desc("c64"), F.asc("vec_id")))
        .alias("rf"),
        F.row_number().over(wq.orderBy(F.desc("c16"), F.asc("vec_id")))
        .alias("rt"),
    )
    return ranked.groupBy("q_vec_id").agg(
        (
            F.count(F.when((F.col("rf") <= _K) & (F.col("rt") <= _K), 1))
            .cast("double")
            / F.lit(float(_K))
        ).alias("recall")
    )

"""A7/A8/B9 — similarity search as native DataFrame transforms.

Reference behavior (vector-client.ts:396-415 `queryEmbeddings`): ship the
query vector to a Postgres function ``f(vec, threshold, count)`` — the
canonical pgvector match_documents: cosine similarity ≥ threshold, best
first, LIMIT count. Result shaped into parallel arrays (content[],
metadata[]) at :411-412 (A8).

Engine shape:
  * cosine = zip_with/aggregate fold (functions.vectors) — JVM codegen,
    no UDF in the hot loop
  * top-k = orderBy(desc(sim), tiebreak).limit(k) ⇒ Spark plans
    TakeOrderedAndProject: each task keeps a k-row heap, the driver
    merges — O(k) memory at any scale, no global sort
  * B9 (query-set variant) = broadcast the query side, window
    row_number per query — the store side never shuffles for the join
  * 100 TB path: LSH candidate pruning before the exact re-rank
    (retrieval.lsh) per BASELINE.json "Batch index build via MLlib"
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.vectors import cosine_similarity


def similarity_search_topk(store: DataFrame, query_vec: list[float],
                           threshold: float = 0.0, k: int = 10,
                           vec_col: str = "embedding",
                           tiebreak: str = "vec_id") -> DataFrame:
    """A7: scalar-query top-k. The query vector folds into the plan as an
    array literal — zero extra scans, zero shuffles before the top-k."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_similarity(F.col(vec_col), q).alias("similarity")
    return (
        store.select("*", sim)
        .where(F.col("similarity") >= threshold)
        .orderBy(F.col("similarity").desc(), F.col(tiebreak).asc())
        .limit(k)
    )


def similarity_join(queries: DataFrame, store: DataFrame, k: int = 5,
                    threshold: float = 0.0,
                    q_id: str = "q_vec_id", q_vec: str = "q_embedding",
                    s_vec: str = "embedding",
                    tiebreak: str = "vec_id") -> DataFrame:
    """B9: top-k store rows per query row (cosine ≥ threshold).

    Plan: broadcast nested-loop join (query side is small by contract) →
    per-query window top-k. The WindowGroupLimit rewrite keeps only k
    rows per query per task before the final per-query sort.
    """
    sim = cosine_similarity(F.col(s_vec), F.col(q_vec)).alias("similarity")
    w = Window.partitionBy(q_id).orderBy(
        F.col("similarity").desc(), F.col(tiebreak).asc()
    )
    return (
        store.crossJoin(F.broadcast(queries))
        .select(q_id, tiebreak, sim)
        .where(F.col("similarity") >= threshold)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def project_results(hits: DataFrame, content_col: str = "content",
                    metadata_cols: tuple[str, ...] = ("doc_id", "lang", "source"),
                    keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """A8: shape retrieved rows like the reference's result set — trimmed
    content + metadata (vector-client.ts:411-412). The reference emits
    parallel arrays (struct-of-arrays); rows are the Spark-native
    equivalent, with to_json(metadata) matching the jsonb round-trip."""
    return hits.select(
        *keep_cols,
        F.trim(F.col(content_col)).alias("content"),
        F.to_json(F.struct(*metadata_cols)).alias("metadata"),
    )

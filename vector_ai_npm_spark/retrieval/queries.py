"""Registry entries for retrieval (A7, A8, B9 + LSH scale variant)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.vectors import o_cosine
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.retrieval.lsh import ann_similarity_join
from vector_ai_npm_spark.retrieval.search import (
    project_results,
    similarity_join,
    similarity_search_topk,
)

# deterministic query vectors: rows of the embeddings fixture itself
# (FIXTURES.md §3) — guarantees a known self-match at similarity 1.0
_QUERY_IDS = (0, 7, 42)


@query(
    "similarity_search_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 7)
    SELECT e.vec_id, e.label,
           {o_cosine('e.embedding', 'q.q_emb')} AS similarity
    FROM embeddings e CROSS JOIN q
    WHERE {o_cosine('e.embedding', 'q.q_emb')} >= 0.1
    ORDER BY similarity DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def similarity_search_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: pgvector-style threshold+top-k (vector-client.ts:396-415
    semantics) with query vector = embeddings[vec_id=7]."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 7).select("embedding").first()[0]
    return similarity_search_topk(
        emb.select("vec_id", "label", "embedding"), list(qvec),
        threshold=0.1, k=10,
    ).select("vec_id", "label", "similarity")


@query(
    "join_similarity",
    oracle=f"""
    SELECT q.vec_id AS q_vec_id, e.vec_id,
           {o_cosine('e.embedding', 'q.embedding')} AS similarity,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {o_cosine('e.embedding', 'q.embedding')} DESC,
                      e.vec_id ASC) AS BIGINT) AS rank
    FROM embeddings e
    CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                WHERE vec_id IN (0, 7, 42)) q
    QUALIFY rank <= 5
    """,
)
def join_similarity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: top-5 neighbors for each of 3 query vectors (broadcast NLJ +
    per-query window; see retrieval.search.similarity_join)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    return similarity_join(queries, emb, k=5, threshold=0.0).select(
        "q_vec_id", "vec_id", "similarity", "rank"
    )


@query("similarity_search_ann")  # rows-only: LSH bucket assignment is model-defined
def similarity_search_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 at scale: LSH-pruned candidate join + exact re-rank
    (BucketedRandomProjectionLSH batch index — BASELINE.json north star).
    tests/test_retrieval.py asserts ≥0.9 recall vs the exact top-k."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    return ann_similarity_join(queries, emb, k=5).select(
        "q_vec_id", "vec_id", "similarity", "rank"
    )


@query(
    "result_project",
    oracle="""
    SELECT doc_id, n_chars,
           trim(text) AS content,
           json_object('doc_id', doc_id, 'lang', lang, 'source', source)
             AS metadata
    FROM documents
    """,
)
def result_project_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: trimmed content + metadata-as-JSON result shaping
    (vector-client.ts:411-412)."""
    docs = load_table(spark, sf_dir, "documents")
    return project_results(
        docs.select("doc_id", "n_chars", "lang", "source",
                    F.col("text").alias("content")),
        content_col="content",
        metadata_cols=("doc_id", "lang", "source"),
        keep_cols=("doc_id", "n_chars"),
    )


@query("similarity_search_ivf")  # rows-only: cell assignment is model-defined
def similarity_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 at scale, variant 2: IVF (k-means coarse quantizer, nprobe
    cell-probed search) — see retrieval.ivf. tests/test_retrieval.py
    asserts ≥0.9 recall vs the exact top-k."""
    from vector_ai_npm_spark.retrieval.ivf import ivf_similarity_join

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    return ivf_similarity_join(queries, emb, k=5, nlist=8, nprobe=4).select(
        "q_vec_id", "vec_id", "similarity", "rank"
    )


@query("vector_store_ivf")  # rows-only: cell assignment is model-defined
def vector_store_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 at-rest layout: build the cell-PARTITIONED on-disk store, then
    answer a top-k search by reading only the probed cell directories
    (partition pruning; plan pinned in tests/test_retrieval.py). The
    query vector is embeddings[vec_id=7], so the self-match must
    surface at rank 1 whenever cell 7 is probed (it always is — the
    query's own cell is its nearest centroid)."""
    import tempfile

    from vector_ai_npm_spark.retrieval.store import (
        persist_ivf_store,
        search_ivf_store,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.where(F.col("vec_id") == 7).select("embedding").first()[0])
    store_dir = tempfile.mkdtemp(prefix="ivf_store_")
    persist_ivf_store(emb, store_dir, nlist=8)
    return search_ivf_store(spark, store_dir, qvec, k=5, nprobe=4).select(
        "vec_id", "cell_id", "similarity", "rank"
    )

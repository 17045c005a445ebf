"""Registry entries for the embedding stage (SURVEY §2A A5, A6/B2 sink)."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.chunking.mdx import split_mdx_headers, synth_mdx
from vector_ai_npm_spark.chunking.queries import _ORACLE_CHUNKS_CTE
from vector_ai_npm_spark.embedding.hashing import embed_input_expr, hashing_embedder
from vector_ai_npm_spark.functions.numeric import o_davg
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


@query(
    "embed_text_format",
    oracle="""
    SELECT doc_id,
           'HEADER: ' || regexp_replace('## Title ' || lang, '^## ', '')
           || ' | CONTENT: ' || substring(text, 1, 120) AS embed_input
    FROM documents
    """,
)
def embed_text_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (formatting half): the exact `HEADER: {h} | CONTENT: {c}` input
    string of vector-client.ts:298-301, '## ' prefix stripped."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        embed_input_expr(
            F.concat(F.lit("## Title "), F.col("lang")),
            F.substring("text", 1, 120),
        ).alias("embed_input"),
    )


@query(
    "embed_text",
    oracle=_ORACLE_CHUNKS_CTE
    + """
    SELECT doc_id, chunk_id,
           CAST(64 AS BIGINT) AS dim,
           TRUE AS norm_ok
    FROM chunks
    """,
)
def embed_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (vector half): chunk the synthesized corpus, format, embed.

    The vector VALUES are defined by our Python hashing model (no DuckDB
    twin — tests/test_embedding.py pins them: determinism, similarity
    ordering), but the vector CONTRACT is oracle-checkable: one
    embedding per chunk (keys mirror the chunk CTE), fixed dim, unit L2
    norm within 1e-6. A regression in the embedder's shape, coverage, or
    normalization turns a TRUE into a FALSE or drops a key → red driver
    row. The library API (`hashing_embedder`) still returns the real
    array<float> vector; this face emits only scalars (raw array columns
    crash the driver's pandas canonicalizer — round-1 red row).
    """
    docs = load_table(spark, sf_dir, "documents")
    chunks = split_mdx_headers(synth_mdx(docs))
    embedded = chunks.select(
        "doc_id",
        "chunk_id",
        hashing_embedder()(embed_input_expr("header", "content")).alias("embedding"),
    )
    arr = F.col("embedding").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(F.transform(arr, lambda x: x * x), F.lit(0.0), lambda a, b: a + b)
    )
    return embedded.select(
        "doc_id",
        "chunk_id",
        F.size("embedding").cast("long").alias("dim"),
        (F.abs(norm - F.lit(1.0)) <= F.lit(1e-6)).alias("norm_ok"),
    )


@query(
    "vector_insert",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(length(content)) AS BIGINT) AS content_chars
    FROM (
      SELECT doc_id, trim(text) AS content FROM documents
    )
    """,
)
def vector_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 + B2: the store sink — write (content, embedding, metadata-JSON)
    to parquet partitioned by a low-cardinality key, then re-read and
    summarize (the oracle-checkable round-trip of the INSERT at
    vector-client.ts:293-313).

    Scale notes: partitionBy(lang) ⇒ partition pruning for per-lang
    retrieval; at 100 TB you'd additionally bucket by a hash of doc_id to
    bound file counts. The summary aggregates prove the round-trip
    preserved rows/contents.
    """
    docs = load_table(spark, sf_dir, "documents")
    store = docs.select(
        "doc_id",
        "lang",
        F.trim(F.col("text")).alias("content"),
        hashing_embedder()(F.col("text")).alias("embedding"),
        F.to_json(F.struct("doc_id", "lang", "source")).alias("metadata"),
    )
    path = tempfile.mkdtemp(prefix="vector_store_") + "/store"
    store.write.mode("overwrite").partitionBy("lang").parquet(path)
    rt = spark.read.parquet(path)
    return rt.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum(F.length("content")).alias("content_chars"),
    )


@query(
    "vector_mean_pool",
    oracle=f"""
    WITH x AS (
      SELECT label, CAST(i - 1 AS BIGINT) AS dim_pos,
             CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS v
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    )
    SELECT label, dim_pos,
           {o_davg('v')} AS mean_component,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM x GROUP BY label, dim_pos
    """,
)
def vector_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooled vectors per label (centroid computation — the
    chunk→document pooling and k-means/IVF building block): posexplode
    components, exact-decimal mean per (label, dim) so the float fold is
    order-independent and bit-equal across engines (functions.numeric).

    100 TB shape: one Generate over the corpus, one shuffle keyed
    (label, dim) with map-side combine — per-group state is a single
    decimal accumulator, memory O(labels × dim) regardless of corpus
    size. Reassembling the pooled array is a downstream
    sort_array(collect_list(struct(dim_pos, v))) over dim-sized groups."""
    from vector_ai_npm_spark.functions.numeric import davg

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim_pos", "v"
        ),
    )
    return x.groupBy("label", F.col("dim_pos").cast("long").alias("dim_pos")).agg(
        davg("v", "mean_component"),
        F.count(F.lit(1)).alias("n_vectors"),
    )

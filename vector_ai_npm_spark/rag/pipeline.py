"""A9/A10/A11/A13 — the answer-side pipeline and end-to-end ingest.

Reference trace (SURVEY §3.3, vector-client.ts:424-489 `getAnswer`):
  1. group retrieved chunks by metadata.context, preserving first-seen
     order (the token-saving dedup at :436-444)              → A9
  2. render '## Chunk {n}' blocks and fill the question/context
     template (:446-475)                                     → A10
  3. call the chat model (:478-482)                          → A11 (stub)

And the ingest composition (SURVEY §3.1, :141-152 `ingestData`):
  chunk (A1) → validate (A2) → count (A4) → subsplit (A3) → embed (A5)
  → store rows (A6). The reference does this one chunk at a time with a
  network call per chunk; here it is ONE lazy DataFrame chain whose only
  Python boundary is the Arrow-batched embed/subsplit UDFs and whose only
  shuffle is the per-doc window for chunk metadata.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from vector_ai_npm_spark.chunking.mdx import (
    split_mdx_headers,
    validate_context,
    with_total_chunks,
)
from vector_ai_npm_spark.chunking.recursive import subsplit_udf
from vector_ai_npm_spark.embedding.hashing import embed_input_expr, hashing_embedder


def context_group_dedup(retrieved: DataFrame, context_col: str = "context",
                        content_col: str = "content",
                        rank_col: str = "rank") -> DataFrame:
    """A9: group retrieved chunks by shared context, keep first-seen order
    and the ordered member contents (vector-client.ts:436-444's
    Map<string, number[]> in set form). One hash aggregate."""
    members = F.transform(
        F.array_sort(F.collect_list(F.struct(rank_col, content_col))),
        lambda s: s[content_col],
    )
    return (
        retrieved.groupBy(context_col)
        .agg(
            F.min(rank_col).cast("long").alias("first_seen"),
            F.concat_ws("\n", members).alias("joined_content"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )
    )


def prompt_assemble(groups: DataFrame, question: str,
                    context_col: str = "context") -> DataFrame:
    """A10: render each group as a '## Chunk {n}' block
    (vector-client.ts:452-461), join the blocks, and fill the
    '# Question / # Context' template (:465-468, :475). Returns a
    single-row DataFrame (question, prompt).

    The block join is an ordered single-group aggregation — at scale the
    retrieved set is k·|queries| rows, never the corpus, so the one-group
    agg is trivially small."""
    n = F.row_number().over(
        Window.orderBy(F.col("first_seen").asc(), F.col(context_col).asc())
    )
    block = F.format_string(
        "## Chunk %d\n### Context\n%s\n### Content\n%s\n---",
        n, F.col(context_col), F.col("joined_content"),
    )
    blocks = groups.select(block.alias("block"), F.col("first_seen"))
    joined = blocks.agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("first_seen", "block"))),
                lambda s: s["block"],
            ),
        ).alias("context_md")
    )
    return joined.select(
        F.lit(question).alias("question"),
        F.format_string("# Question: %s\n# Context: %s", F.lit(question),
                        F.col("context_md")).alias("prompt"),
    )


def llm_answer_stub():
    """A11: pluggable batched inference stage. The reference calls a chat
    model with 2×1000 ms retries (vector-client.ts:478-482) — outside the
    relational correctness contract, so the default implementation is a
    deterministic extractive stub: first sentence of the context block.
    A real model drops in as any pandas_udf with the same signature
    (batch in, string out), e.g. an ONNX session per executor."""

    @F.pandas_udf(StringType())
    def _answer(prompts: pd.Series) -> pd.Series:
        def one(p: str | None) -> str | None:
            if p is None:
                return None
            ctx = p.split("### Content\n", 1)
            body = ctx[1] if len(ctx) > 1 else p
            return "ANSWER: " + body.split("\n", 1)[0][:200]

        return prompts.map(one)

    return _answer


def ingest_pipeline(docs: DataFrame, config=None, text_col: str = "mdx",
                    id_col: str = "doc_id") -> DataFrame:
    """A13: full ingest — returns the store-ready chunk rows
    (content, embedding, metadata) the reference INSERTs one at a time
    (vector-client.ts:141-152).

    Metadata quirks preserved (SURVEY §2A): sub-chunks keep the parent
    chunkId; metadata.context is the parent chunk's own pre-split
    content; totalChunks counts post-split rows per document.
    """
    from vector_ai_npm_spark.engine import EngineConfig

    cfg = config or EngineConfig()
    chunks = split_mdx_headers(docs, text_col=text_col, id_col=id_col)
    flags = validate_context(chunks, id_col=id_col)
    chunks = chunks.join(flags, id_col, "left").where(F.col("is_valid_doc"))

    # AQE's coalescing sizes shuffle reads by BYTES; the downstream
    # subsplit+embed pandas_udfs are CPU-bound per row, so a few-MB
    # chunk set would collapse onto one core. Pin the parallelism for
    # the Python stages explicitly (honored by AQE).
    chunks = chunks.repartition(docs.sparkSession.sparkContext.defaultParallelism)

    sub = chunks.select(
        id_col, "chunk_id", "header", "prev_header", "next_header",
        F.col("content").alias("context"),  # parent content (ref :233)
        F.posexplode(
            subsplit_udf(cfg.chunk_size, cfg.chunk_overlap)(F.col("content"))
        ).alias("sub_pos", "content"),
    )
    sub = with_total_chunks(sub, id_col=id_col)  # post-split count (ref :190)

    meta = F.struct(
        F.col("header"), F.col("prev_header"), F.col("next_header"),
        F.col("chunk_id").alias("chunkId"),
        F.col("total_chunks").alias("totalChunks"),
        F.col("context"),
    )
    return sub.select(
        id_col,
        F.col("chunk_id"),
        F.col("sub_pos").cast("long").alias("sub_pos"),
        F.col("content"),
        hashing_embedder(cfg.embedding_dim)(
            embed_input_expr("header", "content")
        ).alias("embedding"),
        meta.alias("metadata"),
        F.to_json(meta).alias("metadata_json"),
    )

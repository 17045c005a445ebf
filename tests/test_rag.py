"""A13 end-to-end pipeline semantics (SURVEY §5.3-5.4): the golden
pipeline over literal MDX, preserving the reference's metadata quirks."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from vector_ai_npm_spark.engine import EngineConfig, VectorEngine, validate_identifier
from vector_ai_npm_spark.rag.pipeline import ingest_pipeline, llm_answer_stub


@pytest.fixture(scope="module")
def mdx_docs(spark):
    big_section = " ".join(f"tok{i}" for i in range(80))  # ~480 chars
    return spark.createDataFrame(
        [
            (1, "## Context\nsmall ctx\n## Body\n" + big_section),
            (2, "## Intro\nnot valid\n## Body\nxxx"),  # rejected by A2
            (3, "## Context\nanother ctx\n## Tail\nshort content"),
        ],
        ["doc_id", "mdx"],
    )


def test_ingest_pipeline_end_to_end(spark, mdx_docs):
    out = ingest_pipeline(mdx_docs, EngineConfig(chunk_size=120, chunk_overlap=30))
    rows = out.collect()
    assert rows, "pipeline produced no rows"
    # invalid doc 2 filtered out (A2)
    assert {r.doc_id for r in rows} == {1, 3}
    # oversized Body of doc 1 was sub-split, all sub-chunks share chunk_id (A3 quirk)
    body = [r for r in rows if r.doc_id == 1 and r.chunk_id == 2]
    assert len(body) > 1
    assert all(len(r.content) <= 120 for r in body)
    assert all(r.metadata.chunkId == 2 for r in body)
    # newlines flattened in sub-chunks (ref :244)
    assert all("\n" not in r.content for r in body)
    # totalChunks counts post-split rows per doc (A4)
    per_doc = {r.doc_id for r in rows}
    for d in per_doc:
        doc_rows = [r for r in rows if r.doc_id == d]
        assert all(r.metadata.totalChunks == len(doc_rows) for r in doc_rows)
    # metadata.context = parent chunk's own pre-split content (ref :233)
    assert all(r.metadata.context.startswith(body[0].content[:10]) for r in body)
    # embeddings present with the configured dim
    assert all(len(r.embedding) == 64 for r in rows)
    # metadata JSON round-trips
    m = json.loads(rows[0].metadata_json)
    assert set(m) >= {"header", "chunkId", "totalChunks", "context"}


def test_engine_facade(spark, mdx_docs):
    eng = VectorEngine(spark, EngineConfig(chunk_size=120, chunk_overlap=30))
    out = eng.ingest(mdx_docs)
    assert out.count() > 0


def test_llm_stub_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "# Question: q\n# Context: ## Chunk 1\n### Context\nc\n### Content\nanswer line\nmore")],
        ["i", "prompt"],
    )
    out1 = df.select(llm_answer_stub()(F.col("prompt")).alias("a")).first().a
    assert out1 == "ANSWER: answer line"


def test_identifier_validation_blocks_injection():
    validate_identifier("my_table")
    with pytest.raises(ValueError):
        validate_identifier("t; DROP TABLE x")

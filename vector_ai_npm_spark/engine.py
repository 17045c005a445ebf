"""VectorEngine facade (SURVEY.md §2A A14).

Reference parity: ``new VectorClient(options)`` (vector-client.ts:61-113)
eagerly constructs an OpenAI client and a pg Pool from ``apiKey``/``dbUrl``
and stores chunking/model defaults (chunkSize=1000, chunkOverlap=200 at
:72-73; model gpt-4o, temperature 0 at :104-105). The Spark engine keeps
the same config surface but holds a SparkSession instead of network
clients; identifiers are validated instead of string-interpolated into SQL
(the reference's injection bug at :307/:403 is consciously not ported).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def validate_identifier(name: str) -> str:
    """Reject table/function names the reference would have interpolated raw."""
    if not _IDENT.match(name):
        raise ValueError(f"invalid identifier: {name!r}")
    return name


@dataclass
class EngineConfig:
    """Mirrors VectorClientOptions (vector-client.ts:9-17) minus secrets."""

    chunk_size: int = 1000        # vector-client.ts:72
    chunk_overlap: int = 200      # vector-client.ts:73
    embedding_dim: int = 64       # fixtures are 64-dim (1536 for ada-002 parity)
    model: str = "stub-llm"       # reference default gpt-4o (:104) — stubbed
    temperature: float = 0.0      # vector-client.ts:105
    template: str = "# Question: {question}\n# Context: {context}"
    store_path: str | None = None
    extra: dict = field(default_factory=dict)


class VectorEngine:
    """Session + config holder; the operator modules do the real work.

    Usage::

        eng = VectorEngine(spark, EngineConfig(chunk_size=120))
        chunks = eng.ingest(mdx_df)          # A13 pipeline
        hits = eng.similarity_search(qvec, threshold=0.2, k=5)
    """

    def __init__(self, spark: SparkSession, config: EngineConfig | None = None):
        from vector_ai_npm_spark.session import apply_runtime_confs

        self.spark = apply_runtime_confs(spark)
        self.config = config or EngineConfig()

    # --- pipeline entry points (thin wrappers; see each module) ---------

    def ingest(self, docs: DataFrame, text_col: str = "mdx") -> DataFrame:
        from vector_ai_npm_spark.rag.pipeline import ingest_pipeline

        return ingest_pipeline(docs, self.config, text_col=text_col)

    def similarity_search(self, store: DataFrame, query_vec: list[float],
                          threshold: float = 0.0, k: int = 10) -> DataFrame:
        from vector_ai_npm_spark.retrieval.search import similarity_search_topk

        return similarity_search_topk(store, query_vec, threshold, k)

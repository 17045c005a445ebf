"""vector_ai_npm_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference client library
``AnonJon/vector-ai-npm`` (see /root/reference, SURVEY.md).

The reference is a thin TypeScript RAG client (chunk -> embed -> store ->
retrieve -> synthesize, ``src/clients/vector-client.ts``). This package
re-expresses that pipeline — and the LLM-data-pipeline operator families a
100 TB training-data workload needs (dedup, similarity search, multimodal
columns, text analysis, streaming) — as idiomatic Spark DataFrame / SQL /
Structured Streaming programs.

Design rules (SURVEY.md §4):
  * declarative DataFrame plans; Catalyst/AQE pick physical strategies
  * zero custom planner code; UDFs only where built-ins can't express the
    semantics, and then always Arrow-batched (pandas_udf / applyInPandas)
  * every operator ships with a DuckDB-oracle SQL equivalent where
    expressible (driver correctness gate, __spark_entry__.py)
"""

from vector_ai_npm_spark.engine import VectorEngine, EngineConfig

__version__ = "0.1.0"

__all__ = ["VectorEngine", "EngineConfig", "__version__"]

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real definitions live in ``vector_ai_npm_spark.registry``; this file
stays a thin adapter.

DRIVER WINDOW POLICY: the driver oracle-checks only the FIRST 50 names
returned by ``queries()`` each round, so registration order (module
import order in ``registry._load_all_modules``) is a deliberate rotation
schedule: round 1 verified the relational suite; round 2 fronts the
reference-derived A-operators + LLM-pipeline operators (chunking,
embedding, retrieval, rag, dedup, text, streaming, multimodal,
pipeline_ops, udf_suite = exactly 50); later rounds rotate the remainder
(functions_suite, tpch_extra, scale_suite, dedup_embedding_ann,
relational) back into the window until every query has a green driver
row. The FULL set is always verified locally by
tests/test_oracle_parity.py regardless of window position.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from vector_ai_npm_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the A13 ingest pipeline (chunk → validate → subsplit →
    embed → store rows) over the synthesized MDX corpus at sf0.001."""
    return registry.run("ingest_pipeline", spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys → rows-only check."""
    return registry.all_oracles()

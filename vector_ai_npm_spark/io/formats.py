"""Source-format breadth beyond parquet (B1 extension): CSV and JSON
round-trips with explicit schemas.

The reference's only store is Postgres; a Spark-native engine's sources
are whatever the lake holds. These operators prove schema-stable
ingestion from the two text formats that dominate raw drops, with the
rules that matter at scale:

  * ALWAYS pass an explicit schema — schema inference is a full extra
    pass over 100 TB and non-deterministic under dirty data.
  * CSV: header off, explicit nullValue, timestamp columns carried as
    ISO strings (CSV has no types; parse AFTER load so bad rows are
    data, not crashes).
  * JSON lines: one object per line (splittable); nested fields land as
    structs via the schema, not via inference.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def csv_roundtrip(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Write df as headered CSV, read back with the explicit schema."""
    path = tempfile.mkdtemp(prefix="csv_rt_") + "/data"
    df.write.mode("overwrite").option("header", "true").csv(path)
    return df.sparkSession.read.schema(schema).option("header", "true").csv(path)


def json_roundtrip(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Write df as JSON lines, read back with the explicit schema."""
    path = tempfile.mkdtemp(prefix="json_rt_") + "/data"
    df.write.mode("overwrite").json(path)
    return df.sparkSession.read.schema(schema).json(path)


def orc_roundtrip(df: DataFrame) -> DataFrame:
    """Write df as ORC, read back. Unlike the text formats, ORC is a
    typed columnar format — no schema argument needed, and the reader
    keeps predicate pushdown + column pruning (same scan contract as
    parquet; the other columnar format a lake commonly holds)."""
    path = tempfile.mkdtemp(prefix="orc_rt_") + "/data"
    df.write.mode("overwrite").orc(path)
    return df.sparkSession.read.orc(path)

"""binaryFile source scan (wave 19): the media-shard ingest path.

`scan_binary_files` — reads a directory of raw files through Spark's
built-in `binaryFile` format (path, modificationTime, length, content)
— the front door of every multimodal pipeline (B30): image/audio shards
land as opaque files; this source turns them into the (asset, payload)
rows the decode operators consume without any custom reader code.

Fixture: each document's text is materialized once as a real file
(`doc_<id>.txt`) under a per-sf /tmp directory — driver-side setup of
~500 small files at oracle scale (real deployments already have the
files; the SETUP is not the operator).  The query then proves the
round trip entirely inside the engines: Spark reads the files back
through binaryFile and emits (file name, byte length, md5 of the
CONTENT BYTES); the DuckDB oracle recomputes all three from the
`documents` table — a wrong read path, truncated content, or
encoding corruption flips the md5 and fails the hash.

Scale: binaryFile is a standard FileScan — partition-parallel,
pruned by `pathGlobFilter`/partition dirs, with
`spark.sql.files.maxPartitionBytes` batching small files per task;
content bytes stay in the scan task (here reduced to an md5
immediately — the payload-never-shuffles discipline).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


def _materialize_files(spark: SparkSession, sf_dir: str) -> str:
    """Write doc_<id>.txt files once per sf fixture; returns the dir."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/spark_graft_binfiles_{tag}"
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for r in load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect():
        with open(os.path.join(out, f"doc_{r.doc_id}.txt"), "wb") as fh:
            fh.write(r.text.encode("utf-8"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


@query(
    "scan_binary_files",
    oracle="""
    SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS file_name,
           CAST(length(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the binaryFile source — see module docstring.
    (Fixture text is ASCII, so utf-8 byte length == char length and
    DuckDB's string md5 equals the file-bytes md5.)"""
    path = _materialize_files(spark, sf_dir)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(path)
    )
    return files.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )

"""Wave 54: the Spark 4 Python DataSource API as a first-class source.

`scan_python_datasource` exercises the full custom-source lifecycle on
the "recjournal" length-framed binary format (io/pyds.py): a
DISTRIBUTED write through the DataSourceWriter (per-task staged shards
published by rename at commit — the IVF store's atomicity idiom), a
partition-planned read (one task per shard), and REAL filter pushdown
— `pushFilters` absorbs the EqualTo/GreaterThan predicates so matching
happens record-by-record inside the Python reader and the residual
plan keeps only null-guards (plan-gated in tests/test_wave54.py).

Why this face matters for the 100 TB story: bespoke formats are the
norm in crawl pipelines, and the classic Spark answer (binaryFile +
mapPartitions) forfeits split planning, pushdown, and writer
atomicity.  The Spark 4 DataSource API restores all three from pure
Python; this face pins that the engine actually uses them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_CHARS_GT = 200


@query(
    "scan_python_datasource",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(4 AS BIGINT) AS n_shards
    FROM documents
    WHERE n_chars > {_CHARS_GT}
    GROUP BY lang
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recjournal write → read → pushed-filter aggregate — see module
    docstring.  Every number passes through the binary format and the
    Python reader's own filter application, so a framing, partition-
    planning, commit-rename, or pushdown defect flips a count/sum →
    hash red.  n_shards pins that the distributed writer committed
    exactly the repartition count and the reader planned one split
    per shard."""
    import glob
    import tempfile

    from vector_ai_npm_spark.io.pyds import register_recjournal

    register_recjournal(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = tempfile.mkdtemp(prefix="recjournal_") + "/j"
    (
        docs.repartition(4)
        .write.format("recjournal")
        .option("path", path)
        .mode("append")
        .save()
    )
    n_shards = len(glob.glob(path + "/*.recj"))
    back = (
        spark.read.format("recjournal")
        .option("path", path)
        .load()
        .where(F.col("n_chars") > _CHARS_GT)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    ).withColumn("n_shards", F.lit(n_shards).cast("bigint"))

"""Wave 42: corrupt-JSONL permissive scan, grouped-agg pandas UDF.

* `scan_jsonl_corrupt` — the JSON-lines sibling of `scan_csv_corrupt`
  (B1+ tolerant ingest): a JSONL drop with planted malformed lines
  (truncated JSON, type-garbled field, raw non-JSON text) read in
  PERMISSIVE mode with a `_corrupt_record` capture column — bad lines
  become DATA to quarantine, never job failures.  JSONL is the
  dominant interchange format for LLM training corpora (every public
  dump ships it), so this is arguably the most-used scan this engine
  would run.  Oracle: the clean subset round-trips exactly against
  the source rows, the quarantine count rides along as a constant —
  both halves of the PERMISSIVE contract hash-checked.
* `udf_grouped_agg` — the GROUPED_AGG pandas UDF face completing the
  B29 UDF matrix (scalar / SCALAR pandas / applyInPandas grouped map /
  UDTF / mapInArrow were covered; the Series→scalar aggregating
  variant was not): a per-label custom aggregate (int64 dot of cents
  against alternating ±1 signs — deterministic integer math, so the
  face is hash-checkable, unlike a float mean whose pandas fold order
  would be engine-specific).  Plan shape: Arrow-batched partial
  aggregation (`AggregateInPandas`), shuffle carries per-group
  partials only.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_N_BAD = 3


@query(
    "scan_jsonl_corrupt",
    oracle=f"""
    SELECT doc_id, lang, n_chars, CAST({_N_BAD} AS BIGINT) AS n_corrupt
    FROM documents
    """,
)
def scan_jsonl_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSONL scan with quarantine capture — see module
    docstring.  The text column stays out of the face only because the
    fixture text contains no JSON-hostile characters to pin; doc_id /
    lang / n_chars round-trip the int/string/long type surface."""
    import tempfile

    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="jsonl_corrupt_") + "/data"
    good = docs.select(
        F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("line")
    )
    bad = spark.createDataFrame(
        [
            ('{"doc_id": 999, "lang": "en", "n_ch',),  # truncated
            ('{"doc_id": "notanint", "lang": 5, "n_chars": []}',),
            ("this line is not json at all",),
        ],
        ["line"],
    )
    good.unionByName(bad).coalesce(4).write.mode("overwrite").text(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Spark refuses predicates touching ONLY _corrupt_record on a raw
    # JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); materialize the
    # parsed batch first — the real quarantine pattern anyway (parse
    # once, split clean/bad from the materialized result; the
    # scan_csv_corrupt discipline)
    parsed_path = tempfile.mkdtemp(prefix="jsonl_parsed_") + "/parsed"
    raw.write.mode("overwrite").parquet(parsed_path)
    scanned = spark.read.parquet(parsed_path)
    # PERMISSIVE semantics note: the type-garbled line parses as JSON,
    # so doc_id stays NULL while _corrupt_record captures the raw line
    # — it must land in quarantine with the unparseable ones
    n_corrupt = (
        scanned.where(F.col("_corrupt_record").isNotNull())
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    clean = scanned.where(
        F.col("_corrupt_record").isNull() & F.col("doc_id").isNotNull()
    ).select("doc_id", "lang", "n_chars")
    return clean.crossJoin(F.broadcast(n_corrupt)).select(
        "doc_id", "lang", "n_chars", F.col("n").alias("n_corrupt")
    )


@query(
    "udf_grouped_agg",
    oracle="""
    WITH cents AS (
      SELECT label,
             CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT) AS c,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id)
               AS rn
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN rn % 2 = 1 THEN c ELSE -c END) AS BIGINT)
             AS signed_sum_micro
    FROM cents GROUP BY label
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — see module docstring.  The custom
    aggregate (alternating-sign int64 sum over the vec_id order) is
    integer-exact and order-DEFINED, so the Python aggregation is
    hash-checkable against a pure-SQL oracle; sorting happens inside
    each Arrow batch group (per-label frames)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("long")
    def signed_sum(c: pd.Series, rn: pd.Series) -> int:
        import numpy as np

        cv = c.to_numpy(dtype="int64")
        sign = np.where(rn.to_numpy(dtype="int64") % 2 == 1, 1, -1)
        return int((cv * sign).sum())

    emb = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql import Window

    cents = emb.select(
        "label",
        F.floor(
            F.element_at("embedding", 1).cast("double") * 1_000_000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("c"),
        F.row_number()
        .over(Window.partitionBy("label").orderBy("vec_id"))
        .alias("rn"),
    )
    # Spark disallows mixing a GROUPED_AGG pandas UDF with non-pandas
    # aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT) — join the
    # plain count from its own label-keyed aggregate instead
    sums = cents.groupBy("label").agg(
        signed_sum("c", "rn").alias("signed_sum_micro")
    )
    counts = cents.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return counts.join(sums, "label").select(
        "label", "n", "signed_sum_micro"
    )

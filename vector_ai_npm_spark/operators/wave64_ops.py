"""Wave 64: polymorphic Python UDTF — `analyze()`-time dynamic output
schema, the Spark 4 capability that completes the B29 UDF matrix
(scalar / pandas / grouped-map / grouped-agg / mapInArrow / static
UDTF were covered; the table function whose SCHEMA depends on its
ARGUMENTS was not).

`udtf_dynamic_schema` registers a splitter whose column count is a
call-site argument: `char_chunks(text, n)` resolves at analysis time
to n string columns (AnalyzeResult), so the SAME function serves
4-way and 8-way layouts without code changes — the polymorphic-UDTF
pattern Spark 4 added for exactly these schema-from-config pipelines.
The face lateral-joins documents through the 4-ary instance and
re-derives each chunk's LENGTH; the oracle reproduces the split
arithmetic (floor quarters, remainder on the last chunk) without ever
seeing Python, so an analyze/eval disagreement or off-by-one in the
slicing flips a length column → hash red.

Scale shape: one lateral UDTF pass (Arrow-batched), corpus text never
shuffles; outputs are fixed-width smalls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


def make_char_chunks_udtf():
    """The polymorphic splitter (module-level factory so tests can
    register it independently): n equal floor-width chunks, remainder
    riding the last — schema built in analyze() from the n argument."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class CharChunks:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(n.value, int) or n.value < 1:
                raise ValueError("char_chunks needs a literal n >= 1")
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"chunk_{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            if text is None:
                yield tuple([None] * n)
                return
            step = max(len(text) // n, 1)
            parts = [text[i * step : (i + 1) * step] for i in range(n - 1)]
            parts.append(text[(n - 1) * step :])
            yield tuple(parts)

    return CharChunks


@query(
    "udtf_dynamic_schema",
    oracle="""
    WITH src AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT * FROM (VALUES
            (CAST(-1 AS BIGINT), 'ab'),
            (CAST(-2 AS BIGINT), ''),
            (CAST(-3 AS BIGINT), 'abc')
        ) AS t(doc_id, text)
    ),
    stepped AS (
        SELECT doc_id, length(text) AS len,
               GREATEST(length(text) // 4, 1) AS step
        FROM src
    )
    SELECT doc_id,
           CAST(LEAST(GREATEST(len - 0 * step, 0), step) AS BIGINT) AS len_0,
           CAST(LEAST(GREATEST(len - 1 * step, 0), step) AS BIGINT) AS len_1,
           CAST(LEAST(GREATEST(len - 2 * step, 0), step) AS BIGINT) AS len_2,
           CAST(GREATEST(len - 3 * step, 0) AS BIGINT) AS len_3,
           CAST(len AS BIGINT) AS total_len
    FROM stepped
    """,
)
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-ary instance of the polymorphic splitter over documents —
    see module docstring.  The slicing in eval() partitions [0, len)
    exactly for ANY length (short chunks clamp to empty), so the
    oracle's clamped arithmetic (LEAST/GREATEST around the floor-step)
    is total on arbitrary corpora — and three planted short rows
    ('ab', '', 'abc': all shorter than n=4) keep the short-text path
    inside the driver's hash check instead of a docstring assumption
    (r10 verdict item 7 / advice low)."""
    spark.udtf.register("char_chunks", make_char_chunks_udtf())
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shorts = spark.createDataFrame(
        [(-1, "ab"), (-2, ""), (-3, "abc")], "doc_id long, text string"
    )
    docs = docs.unionByName(shorts)
    docs.createOrReplaceTempView("_udtf_docs")
    out = spark.sql(
        """
        SELECT d.doc_id, c.chunk_0, c.chunk_1, c.chunk_2, c.chunk_3
        FROM _udtf_docs d, LATERAL char_chunks(d.text, 4) c
        """
    )
    return out.select(
        "doc_id",
        F.length("chunk_0").cast("bigint").alias("len_0"),
        F.length("chunk_1").cast("bigint").alias("len_1"),
        F.length("chunk_2").cast("bigint").alias("len_2"),
        F.length("chunk_3").cast("bigint").alias("len_3"),
        (
            F.length("chunk_0") + F.length("chunk_1")
            + F.length("chunk_2") + F.length("chunk_3")
        ).cast("bigint").alias("total_len"),
    )

"""Wave 61: XML ingest — the file source and the expression surface.

Spark 4 folded spark-xml into the engine (`spark.read.format("xml")`,
`from_xml`, the classic `xpath_*` expression family), which makes XML
a first-class B1 format this engine should cover — real corpora still
arrive as XML at volume (Wikipedia/arXiv dumps, PubMed, sitemaps,
RSS/Atom feeds).

* `scan_xml` — file-source ingest with a rowTag, ATTRIBUTES (`_id`
  columns), and a nested element struct; values round-trip against
  the documents table.  Scale note (stated, like gzip's): XML rowTag
  splitting is token-scan based and files are splittable by element
  boundaries, but a single document element cannot span workers —
  element size, not file size, bounds memory.
* `xml_funcs` — the expression half: `xpath_string` / `xpath_long` /
  `xpath` (array) over an XML string column, entirely JVM-side (no
  Python in the plan) — the shape used when XML arrives as a COLUMN
  (API payloads in a lake table) rather than files.

Oracle: DuckDB has no XML machinery, so both faces' oracles
reconstruct the expected values from the same synthesis formulas the
XML was built from — the container-audit discipline: the Spark side
can only produce the numbers by actually parsing the XML it wrote.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


@query(
    "scan_xml",
    oracle="""
    SELECT doc_id, lang, n_chars,
           CAST(n_chars * 2 + doc_id % 7 AS BIGINT) AS meta_score
    FROM documents
    """,
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML file-source round-trip: every document becomes a `<doc>`
    element with the id as an ATTRIBUTE, lang/n_chars as child
    elements, and a nested `<meta><score>` element — the three layout
    features (attribute, element, nesting) a real dump mixes.  The
    scan declares an explicit schema (`_id` for the attribute per the
    source's attributePrefix convention) — never inferSchema on a
    100 TB dump; the fixture is written through the real XML SINK, so
    write and read round-trip each other."""
    import tempfile

    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="xml_scan_") + "/data"
    # write through the REAL XML sink (distributed, well-formed files
    # with a root element per part; `_id` maps to an attribute via the
    # attributePrefix convention) — the read must round-trip it
    (
        docs.select(
            F.col("doc_id").alias("_id"),
            "lang",
            "n_chars",
            F.struct(
                (F.col("n_chars") * 2 + F.col("doc_id") % 7).alias("score")
            ).alias("meta"),
        )
        .repartition(4)
        .write.format("xml")
        .option("rowTag", "doc")
        .option("rootTag", "docs")
        .save(path)
    )
    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField(
                "meta",
                T.StructType([T.StructField("score", T.LongType())]),
            ),
        ]
    )
    scanned = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema(schema)
        .load(path)
    )
    return scanned.select(
        F.col("_id").alias("doc_id"),
        "lang",
        "n_chars",
        F.col("meta.score").alias("meta_score"),
    )


@query(
    "xml_funcs",
    oracle="""
    SELECT doc_id,
           lang AS x_lang,
           n_chars AS x_chars,
           CAST(2 AS BIGINT) AS n_tags
    FROM documents
    """,
)
def xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xpath expression family over an XML string COLUMN: extract a
    string, a long, and a node-count, all in whole-stage codegen —
    the no-file XML path for API-payload columns."""
    docs = load_table(spark, sf_dir, "documents")
    xml_col = F.concat(
        F.lit("<d><l>"), F.col("lang"), F.lit("</l><c>"),
        F.col("n_chars"), F.lit("</c></d>"),
    )
    withx = docs.select("doc_id", xml_col.alias("x"))
    return withx.select(
        "doc_id",
        F.expr("xpath_string(x, '/d/l')").alias("x_lang"),
        F.expr("xpath_long(x, '/d/c')").alias("x_chars"),
        F.expr("CAST(size(xpath(x, '/d/*')) AS BIGINT)").alias("n_tags"),
    )

"""Wave 53: left-outer stream-stream join + CSV dialect sniffing.

* `stream_join_left_outer` — the outer half of the B26 interval-join
  pair: every click with its within-window purchase OR a NULL verdict.
  Inner joins emit on match; outer joins are a STATE-EVICTION
  contract (a row's null verdict exists only because the watermark
  proved no match can arrive), which is why the face is worth its own
  oracle.  Batch face here; the real double-watermarked stream with a
  watermark-flush sentinel runs in tests/test_streaming.py.
* `scan_csv_dialect` — B1+ tolerant ingest: four CSV drops in four
  dialects (comma+header, semicolon no-header, tab+header, pipe
  no-header; the comma file carries quoted embedded-delimiter fields),
  each SNIFFED from a bounded head sample (io/dialect.py) and then
  scanned with the INFERRED options — the triage that stops a
  mis-separated file from silently becoming one-column garbage.
  Sniffing is constant work per file (head bytes on the driver);
  the scan stays distributed with explicit schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


@query(
    "stream_join_left_outer",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id, c.ts AS click_ts, p.ts AS purchase_ts,
           p.value AS amount
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 4 HOUR
    """,
)
def stream_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer click→purchase attribution — see module docstring and
    streaming.joins.attribute_clicks_left_outer."""
    from vector_ai_npm_spark.streaming.joins import (
        attribute_clicks_left_outer,
        split_clicks_purchases,
    )

    clicks, purchases = split_clicks_purchases(
        load_table(spark, sf_dir, "events")
    )
    return attribute_clicks_left_outer(clicks, purchases)


_DIALECTS = (  # (delimiter name, delimiter, header?)
    ("comma", ",", True),
    ("semicolon", ";", False),
    ("tab", "\t", True),
    ("pipe", "|", False),
)


@query(
    "scan_csv_dialect",
    oracle="""
    SELECT CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN 'comma' WHEN 1 THEN 'semicolon'
             WHEN 2 THEN 'tab' ELSE 'pipe'
           END AS dialect,
           CAST(doc_id % 4 AS INTEGER) IN (0, 2) AS has_header,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
           TRUE AS sniff_ok
    FROM documents
    GROUP BY 1, 2
    """,
)
def scan_csv_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialect-sniffed CSV ingest — see module docstring.  Each file's
    rows and n_chars sums come ONLY from scanning with the SNIFFED
    (delimiter, header) pair, so a sniffing or quote-handling defect
    mis-splits rows and flips a sum → hash red.  The comma file wraps
    lang in quotes with an embedded comma + doubled quote to pin the
    quote-aware splitter."""
    import tempfile

    from pyspark.sql import types as T

    from vector_ai_npm_spark.io.dialect import sniff_csv_dialect

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="csv_dialect_")
    out_rows = []
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    for idx, (name, delim, header) in enumerate(_DIALECTS):
        part = docs.where(F.col("doc_id") % 4 == idx)
        lang_field = (
            # quoted field with an embedded delimiter AND a doubled
            # quote — only the quote-aware scan parses it back intact
            F.concat(F.lit('"x,'), F.lit('""'), F.col("lang"), F.lit('"'))
            if name == "comma"
            else F.col("lang")
        )
        line = F.concat_ws(
            delim, F.col("doc_id").cast("string"), lang_field,
            F.col("n_chars").cast("string"),
        )
        path = f"{base}/{name}"
        header_lines = (
            [f"doc_id{delim}lang{delim}n_chars"] if header else []
        )
        # FIXTURE SYNTHESIS ONLY (bounded by the fixture slice, like
        # wave42's planted bad lines): the operator under test is the
        # sniff + distributed scan below, not this file build — a real
        # corpus arrives as files, it is never synthesized
        body = [r[0] for r in part.select(line).collect()]
        with open(f"{path}.csv", "w") as fh:
            fh.write("\n".join(header_lines + body) + "\n")
        with open(f"{path}.csv", "rb") as fh:
            sample = fh.read(4096)
        s_delim, s_header = sniff_csv_dialect(sample)
        sniff_ok = (s_delim, s_header) == (delim, header)
        scanned = (
            spark.read.schema(schema)
            .option("sep", s_delim)
            .option("header", str(s_header).lower())
            .option("quote", '"')
            .option("escape", '"')
            .csv(f"{path}.csv")
        )
        agg = scanned.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("sum_n_chars"),
        ).first()
        out_rows.append(
            (name, header, agg["n_rows"], agg["sum_n_chars"], sniff_ok)
        )
    return spark.createDataFrame(
        out_rows,
        "dialect string, has_header boolean, n_rows long, "
        "sum_n_chars long, sniff_ok boolean",
    )

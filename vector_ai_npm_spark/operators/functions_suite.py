"""Scalar function families (SURVEY.md §2B B20–B24).

All expressions are JVM built-ins inside whole-stage codegen — the point
of these queries is to pin engine↔oracle semantic parity for the string /
date / math / array / JSON function surface the A-family operators build
on (e.g. A1 header regexes, A5 prompt formatting, A7 cosine folds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


@query(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substring(p_type, 1, 5) AS type_prefix,
           concat_ws('-', p_brand, p_type) AS brand_type,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
           CAST(length(p_name) AS BIGINT) AS name_len,
           (p_name LIKE '%green%') AS is_green,
           replace(p_type, ' ', '_') AS type_snake,
           split_part(p_type, ' ', 1) AS type_first_word
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20: string expression surface over `part` (narrow, no shuffle)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.length("p_name").cast("long").alias("name_len"),
        F.col("p_name").like("%green%").alias("is_green"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
           CAST(day(o_orderdate) AS BIGINT) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
                AS BIGINT) AS days_to_cutoff,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21: date/time function surface over `orders`.

    o_orderdate is TIMESTAMP_NTZ (naive) so every function here is
    timezone-independent — identical to DuckDB's naive TIMESTAMP.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        F.quarter(d).cast("long").alias("order_quarter"),
        F.dayofmonth(d).cast("long").alias("order_day"),
        F.date_trunc("month", d).cast("timestamp_ntz").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_cutoff"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.add_months(d.cast("date"), 3).alias("plus3m"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_round1,
           abs(l_extendedprice - 30000.0) AS price_dev,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_ceil,
           CAST(floor(l_tax * 100) AS BIGINT) AS tax_floor,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           round(ln(l_extendedprice), 6) AS price_ln6,
           round(power(1.0 + l_discount, 2), 6) AS disc_pow6
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: math function surface over `lineitem`.

    sqrt/abs/% are IEEE-exact (bit-identical across engines). ln/power
    are libm-dependent (may differ in the last ulp between JVM and
    C++), so those two are rounded to 6 decimals on BOTH sides — the
    honest way to pin transcendental parity.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice"), 1).alias("price_round1"),
        F.abs(F.col("l_extendedprice") - 30000.0).alias("price_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.ceil(F.col("l_discount") * 100).alias("disc_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_floor"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln6"),
        F.round(F.pow(F.lit(1.0) + F.col("l_discount"), 2), 6).alias("disc_pow6"),
    )


@query(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(embedding[len(embedding)] AS DOUBLE) AS last_elem,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS vmax,
           CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS vmin,
           sqrt(list_reduce(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                (a, b) -> a + b)) AS l2_norm
    FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23: array function surface over `embeddings` — size, element
    access, min/max, and an L2 norm as a strict left fold (the same
    higher-order-function shape A7's cosine uses). All JVM-side.
    """
    e = load_table(spark, sf_dir, "embeddings")
    arr = F.col("embedding")
    sq = F.transform(arr, lambda x: x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        F.size(arr).cast("long").alias("dim"),
        F.element_at(arr, 1).cast("double").alias("first_elem"),
        F.element_at(arr, -1).cast("double").alias("last_elem"),
        F.array_max(arr).cast("double").alias("vmax"),
        F.array_min(arr).cast("double").alias("vmin"),
        F.sqrt(F.aggregate(sq, F.lit(0.0), lambda a, b: a + b)).alias("l2_norm"),
    )


@query(
    "json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
                AS BIGINT) AS k_bucket,
           (CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS k_high
    FROM events
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24: JSON extraction from `events.props` ({"k": int} strings).

    get_json_object is a codegen'd JSON path walk — no UDF. At scale,
    repeated extraction from the same column would use from_json once
    into a struct; both shapes shown in tests.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k"),
        (k % 10).cast("long").alias("k_bucket"),
        (k > 50).alias("k_high"),
    )


@query(
    "json_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 7
                AS BIGINT) AS k_mod,
           (json_extract_string(props, '$.missing') IS NULL) AS missing_is_null
    FROM events
    """,
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24+: semi-structured data through Spark 4's VARIANT type —
    `parse_json` once into a binary-encoded variant, then typed
    `variant_get` path extraction. Versus the string-walking
    get_json_object (json_funcs), VARIANT parses each document ONCE
    into a shredded binary form, so repeated/nested extraction doesn't
    re-tokenize the JSON text — the 100 TB answer for wide event
    payloads read by many fields (same engine direction as
    Parquet variant shredding). Missing paths yield SQL NULL, pinned
    by `missing_is_null`."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.expr("CAST(variant_get(v, '$.k', 'bigint') AS BIGINT)")
    return ev.select("event_id", v.alias("v")).select(
        "event_id",
        k.alias("k"),
        (k % 7).cast("long").alias("k_mod"),
        F.expr("variant_get(v, '$.missing', 'string')").isNull().alias(
            "missing_is_null"
        ),
    )

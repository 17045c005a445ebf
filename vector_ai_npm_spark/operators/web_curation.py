"""Web-crawl curation operators (wave 12): URL canonicalization dedup
and code-vs-prose detection — two screens every crawl-derived training
corpus runs before text ever reaches the tokenizer.

Reference scope note: the reference (vector-client.ts) has no curation
surface; this extends the sanctioned LLM-pipeline family
(text/curation.py, BASELINE.json north_star).

The fixture has no real URLs or code, so both queries SYNTHESIZE their
inputs deterministically in SQL from (source, doc_id) — identical
expressions in Spark and DuckDB — then run the REAL operator on them.
The synthesis is the fixture adapter; the canonicalization/detection
logic is what the oracle pins (the synth_ppm_media discipline,
multimodal/binary.py).

Scale shapes:
  * `curate_url_canonical`: canonicalization is map-only string work
    (regexp groups + query-param sort); the dedup is one canonical-key
    hash aggregate — survivor count tracks group count.  At 100 TB the
    canonical key is md5'd before the shuffle (the line_dedup narrow-
    shuffle trade) — at fixture scale the raw key ships so the oracle
    can read it.
  * `text_code_detect`: map-only integer feature extraction (symbol
    density, brace balance) + a threshold rule; zero shuffles beyond
    the scan (the embedding_hygiene audit shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

# deterministic URL synthesis: scheme/host carry case + www + default
# port, query params arrive in REVERSED sort order, fragment varies per
# doc — every axis the canonicalizer must fix
_SPARK_URL = (
    "concat('HTTPS://WWW.', source, '.Example.COM:443/p', "
    "CAST(doc_id % 7 AS STRING), '/page?b=', CAST(doc_id % 3 AS STRING), "
    "'&a=', CAST(doc_id % 5 AS STRING), '#sec', CAST(doc_id AS STRING))"
)
_DUCK_URL = (
    "concat('HTTPS://WWW.', source, '.Example.COM:443/p', "
    "CAST(doc_id % 7 AS VARCHAR), '/page?b=', CAST(doc_id % 3 AS VARCHAR), "
    "'&a=', CAST(doc_id % 5 AS VARCHAR), '#sec', CAST(doc_id AS VARCHAR))"
)

_URL_RE = r"^([A-Za-z]+)://(?:[Ww]{3}\.)?([^/?#]+?)(?::443|:80)?(/[^?#]*)?(?:\?([^#]*))?(?:#.*)?$"


@query(
    "curate_url_canonical",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {_DUCK_URL} AS url FROM documents
    ), parts AS (
      SELECT doc_id,
             lower(regexp_extract(url, '{_URL_RE}', 1)) AS scheme,
             lower(regexp_extract(url, '{_URL_RE}', 2)) AS host,
             regexp_extract(url, '{_URL_RE}', 3) AS path,
             regexp_extract(url, '{_URL_RE}', 4) AS q
      FROM u
    ), canon AS (
      SELECT doc_id,
             concat(scheme, '://', host, path,
                    CASE WHEN q = '' THEN ''
                         ELSE concat('?', array_to_string(
                                list_sort(string_split(q, '&')), '&'))
                    END) AS canonical_url
      FROM parts
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_dups,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id
    FROM canon
    GROUP BY canonical_url
    HAVING COUNT(*) >= 2
    """,
)
def curate_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + duplicate-page grouping: lowercase scheme
    and host, strip the `www.` prefix and default ports (:443/:80),
    drop the fragment, and sort query parameters — the normalization
    every crawl dedup (and robots/frontier logic) applies before
    comparing URLs.  Emits each canonical URL fetched under ≥ 2
    distinct raw URLs with its duplicate count and the min-doc_id
    keeper (the dedup_exact keep rule)."""
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", F.expr(_SPARK_URL).alias("url"))
    re = _URL_RE
    parts = u.select(
        "doc_id",
        F.lower(F.regexp_extract("url", re, 1)).alias("scheme"),
        F.lower(F.regexp_extract("url", re, 2)).alias("host"),
        F.regexp_extract("url", re, 3).alias("path"),
        F.regexp_extract("url", re, 4).alias("q"),
    )
    canon = parts.select(
        "doc_id",
        F.concat(
            F.col("scheme"),
            F.lit("://"),
            F.col("host"),
            F.col("path"),
            F.when(F.col("q") == "", F.lit("")).otherwise(
                F.concat(
                    F.lit("?"),
                    F.array_join(F.array_sort(F.split("q", "&")), "&"),
                )
            ),
        ).alias("canonical_url"),
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keeper_id"),
        )
        .where(F.col("n_dups") >= 2)
    )


# plant code-shaped text into every 10th document: words joined with
# the symbol soup real code exhibits (braces, parens, operators)
# one constant, both engines: the expression is engine-portable SQL,
# and a single definition cannot drift the oracle from the Spark side
_CODETEXT = (
    "CASE WHEN doc_id % 10 = 0 THEN "
    "concat('def f() {', replace(text, ' ', '(x); '), '};') "
    "ELSE text END"
)
_SYMS = "(){};=<>[]"
_CODE_THRESHOLD = 20  # symbols per 1000 chars


@query(
    "text_code_detect",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_CODETEXT} AS body FROM documents
    ), feats AS (
      SELECT doc_id,
             CAST(length(body) AS BIGINT) AS n_chars,
             CAST(length(body) - length(translate(body, '{_SYMS}', ''))
                  AS BIGINT) AS n_syms
      FROM t
    )
    SELECT doc_id, n_chars, n_syms,
           CAST((n_syms * 1000) // n_chars AS BIGINT) AS syms_per_kchar,
           ((n_syms * 1000) // n_chars >= {_CODE_THRESHOLD}) AS is_code
    FROM feats
    """,
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection — the router that decides whether a
    document joins the code mix or the text mix (and which tokenizer /
    quality gates apply).  The feature is integer symbol density
    (structural characters per 1000 chars via translate-and-diff —
    no regex scan per class), thresholded at _CODE_THRESHOLD/1000: planted
    code-shaped docs (every 10th) sit far above, word-salad prose at
    exactly 0.  Integer division keeps the score hash-exact; real
    deployments add keyword/indent features on the same map-only
    frame."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.expr(_CODETEXT).alias("body"))
    feats = t.select(
        "doc_id",
        F.length("body").cast("long").alias("n_chars"),
        (
            F.length("body")
            - F.length(F.translate("body", _SYMS, ""))
        ).cast("long").alias("n_syms"),
    )
    density = F.expr("(n_syms * 1000) DIV n_chars")
    return feats.select(
        "doc_id",
        "n_chars",
        "n_syms",
        density.alias("syms_per_kchar"),
        (density >= F.lit(_CODE_THRESHOLD)).alias("is_code"),
    )

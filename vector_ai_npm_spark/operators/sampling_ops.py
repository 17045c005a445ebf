"""Deterministic weighted sampling + differentially-private counts (wave 9).

Two pipeline operators whose production versions are randomized; both are
made reproducible (and cross-engine oracle-checkable) by deriving their
uniforms from md5 of the row/group key — the repo-wide hash discipline
(dedup/queries.py:13): md5 is the one hash both Spark and DuckDB compute
identically, and 13 hex chars → a 52-bit integer that is EXACTLY
representable as a double, so `u = (v + 0.5) / 2^52` is bit-identical in
both engines.  At production scale swap the md5-uniform for xxhash64 of
(seed, key) — same plan, faster hash, still reproducible runs.

`sample_weighted_topk` — Efraimidis–Spirakis weighted sampling without
replacement: each row draws key `u^(1/w)` and the k largest keys ARE a
weighted sample without replacement (P[first pick = i] = w_i/Σw).  Here
documents are weighted by length — the token-budget-proportional corpus
subsample every training-mix pipeline needs.  We rank by the monotone
transform `ln(u)/w` (same order, no pow), so one expression, no
iteration, no rejection loop.

Scale design: this is ONE map expression + a global top-k.  Spark plans
the top-k as TakeOrderedAndProject — per-partition k-row heaps, then a
k·partitions driver merge — so there is NO global sort and NO shuffle of
the corpus.  That is the whole point of E-S sampling at 100 TB: the
naive alternative (cumulative-weight inverse sampling) needs a global
prefix sum over all weights; E-S needs a scan.  Extends to per-stratum
sampling by swapping the top-k for one rank window per stratum
(sample_stratified_k is the sibling with uniform weights).

`dp_noisy_counts` — per-(event_type, day) counts released under pure
ε-differential privacy via the two-sided geometric mechanism (discrete
Laplace), the integer-valued mechanism used for count queries (Ghosh,
Roughgarden & Sundararajan 2009).  noise = G₁ − G₂ with
G = floor(−ln(u)/ε) geometric; ε = 1, sensitivity 1 (an event belongs
to one (type, day) cell).  The uniforms derive from the GROUP key, so
the release is reproducible run-to-run — the property a published
statistics pipeline needs (re-running the job must not leak a fresh
noise draw; persisting the seed per release epoch is the documented
production pattern).

Scale design: noise adds ZERO distributed work — one hash-aggregate
produces the counts (map-side partials, matrix-sized output), and the
mechanism is a scalar expression on the aggregated rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_K = 100
_TWO52 = float(1 << 52)

# md5-uniform in (0, 1): 13 hex chars = 52 bits, +0.5 centers away from 0
_S_U = (
    "((cast(conv(substring(md5({key}), 1, 13), 16, 10) as double) + 0.5d)"
    f" / {_TWO52!r}d)"
)
_O_U = (
    "((CAST(CAST('0x' || substring(md5({key}), 1, 13) AS BIGINT) AS DOUBLE)"
    f" + 0.5) / {_TWO52!r})"
)


@query(
    "sample_weighted_topk",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln({_O_U.format(key="CAST(doc_id AS VARCHAR) || '#sw'")})
               / CAST(n_chars AS DOUBLE) AS es_key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars,
           CAST(ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id)
                AS BIGINT) AS sample_rank
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT {_K}
    """,
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus sample without replacement (E-S top-k) —
    see module docstring.  The float sort key stays INTERNAL (only the
    rank is emitted): ranks are stable because 52-bit-seeded keys are
    ulp-separated with overwhelming probability, while emitting the key
    itself would hash-compare transcendental bits cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    u = _S_U.format(key="concat(cast(doc_id as string), '#sw')")
    keyed = docs.where(F.col("n_chars") > 0).select(
        "doc_id",
        "n_chars",
        (F.expr(f"ln{u}") / F.col("n_chars").cast("double")).alias("es_key"),
    )
    order = (F.desc("es_key"), F.asc("doc_id"))
    # orderBy().limit() plans as TakeOrderedAndProject (per-partition
    # k-heaps, no global sort); the rank window then runs over the
    # k-row result only
    return (
        keyed.orderBy(*order)
        .limit(_K)
        .select(
            "doc_id",
            "n_chars",
            F.row_number().over(Window.orderBy(*order))
            .cast("bigint")
            .alias("sample_rank"),
        )
    )


_EPS = 1.0


@query(
    "dp_noisy_counts",
    oracle=f"""
    WITH g AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             event_type || '|' || CAST(CAST(date_trunc('day', ts) AS DATE)
                                       AS VARCHAR) AS gk
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day,
           n + CAST(FLOOR(-ln({_O_U.format(key="gk || '#dp1'")}) / {_EPS!r})
                    AS BIGINT)
             - CAST(FLOOR(-ln({_O_U.format(key="gk || '#dp2'")}) / {_EPS!r})
                    AS BIGINT) AS noisy_n
    FROM g
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 two-sided-geometric DP release of (event_type, day) counts —
    see module docstring for the mechanism and the seeded-noise
    production contract."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date").alias("day")
    g = (
        ev.groupBy("event_type", day)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "gk",
            F.concat(
                F.col("event_type"), F.lit("|"), F.col("day").cast("string")
            ),
        )
    )

    def geom(tag: str) -> F.Column:
        u = _S_U.format(key=f"concat(gk, '#{tag}')")
        return F.expr(f"cast(floor(-ln{u} / {_EPS!r}d) as bigint)")

    return g.select(
        "event_type",
        "day",
        (F.col("n") + geom("dp1") - geom("dp2")).alias("noisy_n"),
    )

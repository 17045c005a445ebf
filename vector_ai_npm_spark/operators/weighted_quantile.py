"""Exact weighted percentiles (wave 16).

`agg_weighted_percentile` — the weighted p-quantile: the smallest
value v whose cumulative weight reaches p·W (weights here are
l_quantity units, values are l_extendedprice cents — "the price level
below which p% of shipped units sell").  The unweighted exact
quantiles live in `agg_percentile` / `agg_percentile_dist`; the
weighted form is what fairness audits and unit-economics reports
actually need, and no Spark built-in provides it exactly.

Cross-engine determinism: everything is integer — values as cents
(FLOOR(x·100+0.5), the eval_metrics cents rule), weights as unit
counts, and the threshold test `100·cum_w ≥ pct·W` as an integer
cross-multiplication (DECIMAL(19,0)² products so 1e11-row weight
totals cannot overflow), so the selected value is exact and the only
doubles are the final cents→currency casts.

Scale: one distinct-value aggregate off the scan, cumulative weights
via the shared two-level prefix (functions/prefix.py — the only
unpartitioned window rides the bounded carry-bucket aggregate), a
4-percentile lattice over the value-domain frame, and a 4-row min
fold.  The corpus never re-shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.prefix import cum_before
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_PCTS = (25, 50, 75, 90)
_CENTS = "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
_WQ_BUCKET = 1_000_000  # cents per carry bucket (price domain fixed)


@query(
    "agg_weighted_percentile",
    oracle=f"""
    WITH fact AS (
      SELECT {_CENTS} AS cents,
             CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS w
      FROM lineitem
    ), by_val AS (
      SELECT cents, CAST(SUM(w) AS BIGINT) AS w
      FROM fact GROUP BY cents
    ), cum AS (
      SELECT cents, w,
             CAST(COALESCE(SUM(w) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + w
               AS BIGINT) AS cum_w
      FROM by_val
    ), tot AS (SELECT CAST(SUM(w) AS BIGINT) AS total_w FROM by_val),
    lat AS (
      SELECT p.pct, c.cents, tot.total_w
      FROM (VALUES {", ".join(f"({p})" for p in _PCTS)}) AS p(pct)
      CROSS JOIN cum c CROSS JOIN tot
      WHERE CAST(100 AS DECIMAL(19,0)) * CAST(c.cum_w AS DECIMAL(19,0))
            >= CAST(p.pct AS DECIMAL(19,0)) * CAST(tot.total_w AS DECIMAL(19,0))
    )
    SELECT CAST(pct AS BIGINT) AS pct,
           CAST(MIN(cents) AS DOUBLE) / 100.0 AS weighted_value,
           total_w
    FROM lat GROUP BY pct, total_w
    """,
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted p-quantiles of extended price, weighted by
    shipped units — min value with 100·cum_weight ≥ pct·W, all integer
    (see module docstring for the shapes)."""
    li = load_table(spark, sf_dir, "lineitem")
    fact = li.select(
        F.expr(_CENTS).alias("cents"),
        F.expr("CAST(FLOOR(l_quantity + 0.5) AS BIGINT)").alias("w"),
    )
    by_val = fact.groupBy("cents").agg(F.sum("w").cast("bigint").alias("w"))
    cum = cum_before(by_val, "cents", "w", _WQ_BUCKET).withColumn(
        "cum_w", (F.col("cum_before") + F.col("w")).cast("bigint")
    )
    tot = by_val.agg(F.sum("w").cast("bigint").alias("total_w"))
    d19 = "decimal(19,0)"
    lat = (
        cum.select(
            "cents",
            "cum_w",
            F.explode(F.array(*[F.lit(p) for p in _PCTS])).alias("pct"),
        )
        .crossJoin(F.broadcast(tot))
        .where(
            F.lit(100).cast(d19) * F.col("cum_w").cast(d19)
            >= F.col("pct").cast(d19) * F.col("total_w").cast(d19)
        )
    )
    return lat.groupBy(
        F.col("pct").cast("bigint").alias("pct"), "total_w"
    ).agg(
        (F.min("cents").cast("double") / F.lit(100.0)).alias("weighted_value")
    ).select("pct", "weighted_value", "total_w")

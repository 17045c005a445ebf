"""Experimentation + robust-cleaning operators (wave 3).

* `ab_test_summary` — the product-experimentation readout: users are
  deterministically bucketed into two arms (seedless md5 of user_id —
  the same engine-stable assignment rule real experiment platforms use
  so a user never flips arms), and each arm reports exposure, converter
  counts, purchase totals, exact-decimal revenue, and the conversion
  rate.  The
  statistical decision (z/χ² p-value) needs erf/ln — engine-divergent
  libm — so the face reports the exact sufficient statistics instead;
  any downstream tool computes p from them bit-freely.
* `curate_winsorize` — robust outlier clamping: per-event_type p01/p99
  (exact ``percentile_disc``) pulled back as a tiny broadcast stats
  frame, values clamped into [p01, p99] — the standard winsorization
  pass before training on heavy-tailed telemetry.  Same two-pass shape
  as `anomaly_mad` (grouped percentile pass over the fact, stats-sized
  join back), one fact shuffle total.

Scale: arm aggregation is 2 rows of state; winsorize stats are
|event_type| rows broadcast back over the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.numeric import dsum, o_dsum
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

# md5-derived arm assignment (cross-engine hash idiom, text/curation.py)
_SPARK_ARM = (
    "CASE WHEN pmod(CAST(conv(substring(md5(CAST(user_id AS STRING) || "
    "'#ab1'), 1, 8), 16, 10) AS BIGINT), 2) = 0 THEN 'control' "
    "ELSE 'treatment' END"
)
_DUCK_ARM = (
    "CASE WHEN (CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || "
    "'#ab1'), 1, 8) AS BIGINT) % 2) = 0 THEN 'control' "
    "ELSE 'treatment' END"
)


@query(
    "ab_test_summary",
    oracle=f"""
    WITH assigned AS (
      SELECT user_id, {_DUCK_ARM} AS arm FROM events GROUP BY user_id
    ),
    per_user AS (
      SELECT a.user_id, a.arm,
             CAST(COUNT(*) FILTER (WHERE e.event_type = 'purchase') AS BIGINT)
               AS purchases,
             COALESCE(SUM(CAST(e.value AS DECIMAL(30,8)))
                        FILTER (WHERE e.event_type = 'purchase'), 0) AS revenue
      FROM assigned a JOIN events e ON a.user_id = e.user_id
      GROUP BY a.user_id, a.arm
    )
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) FILTER (WHERE purchases > 0) AS BIGINT) AS n_converters,
           CAST(SUM(purchases) AS BIGINT) AS n_purchases,
           {o_dsum('CAST(revenue AS DOUBLE)')} AS revenue,
           CAST(COUNT(*) FILTER (WHERE purchases > 0) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS conversion_rate
    FROM per_user
    GROUP BY arm
    """,
)
def ab_test_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm experiment readout over the events stream — see module
    docstring.  One user-keyed aggregate then a 2-row arm rollup; the
    assignment hash rides the same scan (no separate assignment table
    at any scale)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.withColumn("arm", F.expr(_SPARK_ARM))
        .groupBy("user_id", "arm")
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "purchases"
            ),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast("decimal(30,8)"),
                    )
                ),
                F.lit(0).cast("decimal(30,8)"),
            ).alias("revenue"),
        )
    )
    return per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("purchases") > 0, 1)).alias("n_converters"),
        F.sum("purchases").alias("n_purchases"),
        dsum(F.col("revenue").cast("double"), "revenue"),
        (
            F.count(F.when(F.col("purchases") > 0, 1)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("conversion_rate"),
    )


@query(
    "curate_winsorize",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             quantile_disc(value, 0.01) AS p01,
             quantile_disc(value, 0.99) AS p99
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN e.value < s.p01 THEN s.p01
                WHEN e.value > s.p99 THEN s.p99
                ELSE e.value END AS value_winsorized,
           (e.value < s.p01 OR e.value > s.p99) AS clamped
    FROM events e JOIN stats s USING (event_type)
    """,
)
def curate_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization at p01/p99 per event_type (robust clamp before
    training on heavy-tailed values) — exact discrete percentiles, so
    every clamped value is a value that occurs in the data and both
    engines agree bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY value)").alias(
            "p01"
        ),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias(
            "p99"
        ),
    )
    clamped = (F.col("value") < F.col("p01")) | (
        F.col("value") > F.col("p99")
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.when(F.col("value") < F.col("p01"), F.col("p01"))
        .when(F.col("value") > F.col("p99"), F.col("p99"))
        .otherwise(F.col("value"))
        .alias("value_winsorized"),
        clamped.alias("clamped"),
    )

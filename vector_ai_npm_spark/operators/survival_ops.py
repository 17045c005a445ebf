"""Kaplan-Meier survival estimation (wave 11).

`events_survival_km` estimates time-to-conversion survival: for each
user, time from first ``signup`` to first subsequent ``purchase`` (in
whole days); users who never purchase are RIGHT-CENSORED at the corpus
watermark — the situation that makes naive "average days to convert"
wrong (it silently drops or mis-ranks the users who have not converted
YET).  Kaplan-Meier (1958) is the standard estimator under censoring:

    S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)

over distinct event days tᵢ, with dᵢ conversions at tᵢ and nᵢ the
at-risk count (not yet converted, not yet censored).  The same operator
is churn/retention survival with churn as the event.

Distributed shape (100 TB):

* One user-keyed reduction produces each user's (duration, converted)
  pair — window MINs over the user partition, the funnel_steps shape.
  Everything downstream operates on the DAY-LEVEL life table, bounded
  by the observation span (≤ |days| rows), never user-sized.
* The at-risk counts nᵢ are a suffix sum over the day table (two-level
  prefix decomposition is unnecessary at |days| rows — a single window
  over the tiny frame; the orders_pareto_abc carry applies if the time
  grid ever grows corpus-scale).
* The survival product is a LEFT FOLD over the day-ordered factor
  array (collect over the bounded day frame): both engines multiply
  doubles in the identical order, so S(t) is bit-exact without
  exp/ln — the engine-divergent route every SQL "product via
  EXP(SUM(LN))" trick takes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


@query(
    "events_survival_km",
    oracle="""
    WITH wm AS (SELECT MAX(ts) AS w FROM events),
    per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
      FROM events GROUP BY user_id
    ), life AS (
      SELECT user_id,
             CASE WHEN p_ts >= s_ts THEN
               CAST(date_diff('day', s_ts, p_ts) AS BIGINT)
             ELSE CAST(date_diff('day', s_ts, (SELECT w FROM wm))
                       AS BIGINT) END AS t,
             COALESCE(p_ts >= s_ts, FALSE) AS converted
      FROM per_user WHERE s_ts IS NOT NULL
    ), day_tbl AS (
      SELECT t,
             CAST(COUNT(*) FILTER (converted) AS BIGINT) AS d,
             CAST(COUNT(*) FILTER (NOT converted) AS BIGINT) AS c
      FROM life GROUP BY t
    ), at_risk AS (
      SELECT t, d, c,
             CAST(SUM(d + c) OVER (
               ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS n
      FROM day_tbl
    )
    SELECT t AS day, d AS n_events, c AS n_censored, n AS n_at_risk,
           list_reduce(
             list_prepend(CAST(1.0 AS DOUBLE),
               list(1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE))
                 OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)),
             (acc, x) -> acc * x) AS survival
    FROM at_risk
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier signup→purchase survival curve with right censoring
    at the corpus watermark — see module docstring."""
    ev = load_table(spark, sf_dir, "events")
    wm = F.broadcast(ev.agg(F.max("ts").alias("w")))
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
        .alias("s_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .alias("p_ts"),
    )
    life = (
        per_user.where(F.col("s_ts").isNotNull())
        .crossJoin(wm)
        .select(
            F.when(
                F.col("p_ts") >= F.col("s_ts"),
                F.datediff(F.col("p_ts"), F.col("s_ts")),
            )
            .otherwise(F.datediff(F.col("w"), F.col("s_ts")))
            .cast("long")
            .alias("t"),
            F.coalesce(F.col("p_ts") >= F.col("s_ts"), F.lit(False))
            .alias("converted"),
        )
    )
    day_tbl = life.groupBy("t").agg(
        F.count(F.when(F.col("converted"), 1)).alias("d"),
        F.count(F.when(~F.col("converted"), 1)).alias("c"),
    )
    w_desc = (
        Window.orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = day_tbl.select(
        "t", "d", "c",
        F.sum(F.col("d") + F.col("c")).over(w_desc).alias("n"),
    )
    w_asc = (
        Window.orderBy(F.asc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    factors = F.collect_list(
        F.lit(1.0) - F.col("d").cast("double") / F.col("n").cast("double")
    ).over(w_asc)
    return at_risk.select(
        F.col("t").alias("day"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.col("n").alias("n_at_risk"),
        F.aggregate(
            factors, F.lit(1.0), lambda acc, x: acc * x
        ).alias("survival"),
    )

"""Wave 39: simple exponential smoothing (SES) forecast QA.

`events_forecast_ses` — per event type, the classic α=½ exponential
smoothing level over daily counts (s₁ = x₁; s_t = ½x_t + ½s_{t−1}),
its one-step-ahead forecast (ŷ_t = s_{t−1}), and the absolute
forecast error — the "is tomorrow predictable from the level" QA next
to events_mase_seasonal's seasonal-naive yardstick.  SES is THE
baseline every forecasting system must beat (Hyndman & Athanasopoulos,
Forecasting: Principles and Practice).

Cross-engine determinism (the survival-curve lesson): the recurrence
is a LEFT FOLD over the day-ordered count prefix — DuckDB's
list_reduce seeds with the FIRST element (exactly s₁ = x₁), and the
Spark mirror reproduces that seeding with a NULL-initialized
aggregate() — so both engines multiply/add doubles in the identical
order and every level is bit-exact.  No exp/ln anywhere; α = ½ keeps
every weight an exact power of two.

Scale shape: the corpus reduces to (type, day) counts in the first
aggregate; prefix collection and the lag window run on the
day-bounded, type-partitioned frame (≤ |days| rows per type).  The
per-row prefix fold is O(days²) per type — days-bounded, corpus-
independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


@query(
    "events_forecast_ses",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), folded AS (
      SELECT event_type, day, c,
             list_reduce(
               list(CAST(c AS DOUBLE)) OVER (
                 PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               (acc, x) -> 0.5 * x + 0.5 * acc) AS ses_level
      FROM daily
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, c, ses_level,
           LAG(ses_level) OVER w AS forecast,
           ABS(CAST(c AS DOUBLE) - LAG(ses_level) OVER w) AS abs_err
    FROM folded
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def events_forecast_ses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=½ SES level + one-step forecast error — see module
    docstring."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w_prefix = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # DuckDB's list_reduce seeds the fold with the FIRST element;
    # mirror with a NULL-initialized aggregate so both engines compute
    # s1 = x1, then 0.5*x + 0.5*acc in the same order
    folded = (
        daily.withColumn(
            "prefix", F.collect_list(F.col("c").cast("double")).over(w_prefix)
        )
        .select(
            "event_type", "day", "c",
            F.expr(
                "aggregate(prefix, CAST(NULL AS DOUBLE), (acc, x) -> "
                "IF(acc IS NULL, x, 0.5 * x + 0.5 * acc))"
            ).alias("ses_level"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    forecast = F.lag("ses_level").over(w)
    return folded.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "c",
        "ses_level",
        forecast.alias("forecast"),
        F.abs(F.col("c").cast("double") - forecast).alias("abs_err"),
    )

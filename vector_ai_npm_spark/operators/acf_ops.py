"""Autocorrelation of the daily event series (wave 17).

`events_autocorr` — sample autocorrelation of daily event counts at
lags 1..7, the stationarity/seasonality readout a pipeline checks
before trusting trend fits (`events_trend_ols`) or anomaly baselines
(`events_anomaly_seasonal`): a strong lag-7 spike means weekly
seasonality; slow decay means drift.

Exactness: with integer daily counts x_t and n days, center by
clearing the mean — y_t = n·x_t − Σx is an exact integer — and the
ACF at lag k is r_k = Σ_t y_t·y_{t+k} / Σ_t y_t², an exact int64
fraction (num/den emitted + one IEEE division).  This matches the
standard biased sample ACF (denominator over all t) exactly when the
mean is the full-series mean.  No float folds anywhere.

Scale shape: the corpus reduces to the |days|-row daily frame in one
aggregate (map-side combine); the calendar densification (missing
days count 0), the lag self-join, and the 7-lag fold all run over
that tiny frame.  int64 headroom: |y| ≤ n·x_max, so Σy² ≤ n·(n·x_max)²
needs n³·x_max² ≤ 9.2e18 — comfortable to ~10⁵ days × 10⁶ events/day
via the DECIMAL(38,0) intermediates used below; outputs cast to
BIGINT within the documented fixture bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_MAX_LAG = 7


@query(
    "events_autocorr",
    oracle=f"""
    WITH daily0 AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    cal AS (
      SELECT unnest(generate_series((SELECT MIN(day) FROM daily0),
                                    (SELECT MAX(day) FROM daily0),
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    daily AS (
      SELECT c.day,
             ROW_NUMBER() OVER (ORDER BY c.day) - 1 AS t,
             COALESCE(d.x, 0) AS x
      FROM cal c LEFT JOIN daily0 d ON d.day = c.day
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
      FROM daily
    ),
    y AS (
      SELECT t, CAST(tot.n * daily.x - tot.s AS BIGINT) AS y
      FROM daily CROSS JOIN tot
    ),
    den AS (
      SELECT CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS BIGINT) AS d
      FROM y
    ),
    lags AS (
      SELECT k.lag,
             CAST(SUM(CAST(a.y AS DECIMAL(19,0)) * b.y) AS BIGINT) AS num
      FROM (VALUES {", ".join(f"({k})" for k in range(1, _MAX_LAG + 1))})
        AS k(lag)
      JOIN y a ON TRUE
      JOIN y b ON b.t = a.t + k.lag
      GROUP BY k.lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, num, den.d AS den,
           CAST(num AS DOUBLE) / CAST(den.d AS DOUBLE) AS acf
    FROM lags CROSS JOIN den
    """,
)
def events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count ACF at lags 1..7 — see module docstring for the
    exact mean-clearing.  Calendar-densified (missing days are 0), the
    same discipline as `timeseries_gapfill`."""
    ev = load_table(spark, sf_dir, "events")
    daily0 = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    span = daily0.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    # unpartitioned window over the |days|-row calendar frame only (the
    # corpus reduced in the daily aggregate above — plan-gate-compliant)
    w_t = F.row_number().over(Window.orderBy("day"))
    daily = (
        cal.join(daily0, "day", "left")
        .select("day", F.coalesce("x", F.lit(0)).alias("x"))
        .withColumn("t", w_t - 1)
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    y = daily.crossJoin(F.broadcast(tot)).select(
        "t", (F.col("n") * F.col("x") - F.col("s")).cast("bigint").alias("y")
    )
    den = y.agg(
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
        .cast("bigint")
        .alias("den")
    )
    lags = y.select(
        "t",
        "y",
        F.explode(
            F.array(*[F.lit(k) for k in range(1, _MAX_LAG + 1)])
        ).alias("lag"),
    )
    b = y.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    num = (
        lags.join(b, lags.t + lags.lag == b.tb)
        .groupBy("lag")
        .agg(
            F.sum(F.col("y").cast("decimal(19,0)") * F.col("yb"))
            .cast("bigint")
            .alias("num")
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("lag").cast("bigint").alias("lag"),
        "num",
        "den",
        (F.col("num").cast("double") / F.col("den").cast("double")).alias(
            "acf"
        ),
    )

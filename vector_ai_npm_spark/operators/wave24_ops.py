"""Wave 24: regression evaluation metrics, event-lateness profile.

Two operators filling family gaps, each exact and oracle-checked:

* `eval_regression_metrics` — MAE / RMSE / R² over a deterministic
  synthetic prediction column (md5 cent-noise around the purchase
  value — the classification suite's `cal_scored` convention applied
  to regression; the engine's job is the exact distributed metric
  fold, the model is a fixture).  Exactness: truth and prediction are
  quantized to EXACT integer cents (floor(v·100+½) — correctly-rounded
  ops only), so residuals, SAE, SSE and the centered SST fold as exact
  integers/decimals; MAE and RMSE are single identical double
  expressions, and R² = 1 − n·SSE/SST is emitted with its exact
  decimal numerator/denominator THROUGH THE VARCHAR BRIDGE
  (functions.numeric.o_dsum's lesson: DuckDB's direct
  decimal→double cast double-rounds past 2⁵³ — n·Σy² ≈ 2.5e19 at
  sf0.01 already crosses it, measured).
* `events_lateness_profile` — per-user out-of-orderness audit over a
  synthetic DELIVERY order (event time + deterministic md5 delay of
  0–120 s per event — the fixture's event ids are perfectly
  time-ordered, so the delay synthesis supplies the disorder the
  engine must then measure, the cal_scored convention): lateness =
  running-max(event time arrived so far) − event time, in exact
  integer seconds (0 for in-order arrivals).
  This is THE watermark-tuning input for the streaming suite (a
  `withWatermark` delay below the observed p99 lateness silently
  drops that tail — the stream_watermark face shows the effect, this
  face measures the cause).  In-order fraction is an exact integer
  fraction; the late-tail p50/p90/p99 ride the same distinct-value +
  two-level-prefix shape as `events_interarrival`.

Scale shape: regression metrics reduce the purchase scan to ONE row
of integer/decimal power sums (map-side combine); lateness reduces to
per-user running-max windows (user-partitioned) then a
second-resolution distinct-value frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.prefix import cum_before
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.eval_metrics import (
    _duck_hash_mod,
    _o_d2d,
    _spark_hash_mod,
)
from vector_ai_npm_spark.registry import query

_D38 = "decimal(38,0)"


@query(
    "eval_regression_metrics",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
               + ({_duck_hash_mod("event_id", "#reg", 2001)} - 1000) AS p
      FROM events WHERE event_type = 'purchase'
    ),
    folds AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ABS(p - y)) AS BIGINT) AS sae_c,
             CAST(SUM(CAST(p - y AS DECIMAL(38,0)) * (p - y)) AS BIGINT)
               AS sse_c2,
             SUM(CAST(y AS DECIMAL(38,0))) AS s_y,
             SUM(CAST(y AS DECIMAL(38,0)) * y) AS s_y2
      FROM scored
    )
    SELECT n, sae_c, sse_c2,
           {_o_d2d('n * s_y2 - s_y * s_y')} AS sst_c2,
           CAST(sae_c AS DOUBLE) / CAST(n AS DOUBLE) / 100 AS mae,
           SQRT(CAST(sse_c2 AS DOUBLE) / CAST(n AS DOUBLE)) / 100 AS rmse,
           {_o_d2d('n * s_y2 - s_y * s_y - n * CAST(sse_c2 AS DECIMAL(38,0))')}
             / {_o_d2d('n * s_y2 - s_y * s_y')} AS r2
    FROM folds
    """,
)
def eval_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed regression metrics — see module docstring.
    One purchase scan → 1-row integer/decimal power-sum fold; SST and
    the R² numerator leave the engine only as varchar-bridged doubles
    (exact decimal print + correctly-rounded strtod in both engines —
    their BIGINT casts overflow at sf0.01 scale already)."""
    ev = load_table(spark, sf_dir, "events")
    y = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    p = y + (
        _spark_hash_mod(F.col("event_id"), "#reg", 2001) - F.lit(1000)
    )
    scored = ev.where(F.col("event_type") == "purchase").select(
        y.alias("y"), p.alias("p")
    )
    folds = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.abs(F.col("p") - F.col("y"))).cast("bigint").alias("sae_c"),
        F.sum((F.col("p") - F.col("y")).cast(_D38) * (F.col("p") - F.col("y")))
        .cast("bigint")
        .alias("sse_c2"),
        F.sum(F.col("y").cast(_D38)).alias("s_y"),
        F.sum(F.col("y").cast(_D38) * F.col("y")).alias("s_y2"),
    )
    sst = F.col("n") * F.col("s_y2") - F.col("s_y") * F.col("s_y")
    r2_num = sst - F.col("n") * F.col("sse_c2").cast(_D38)
    return folds.select(
        "n",
        "sae_c",
        "sse_c2",
        sst.cast("string").cast("double").alias("sst_c2"),
        (
            F.col("sae_c").cast("double") / F.col("n").cast("double") / 100
        ).alias("mae"),
        (
            F.sqrt(F.col("sse_c2").cast("double") / F.col("n").cast("double"))
            / 100
        ).alias("rmse"),
        (
            r2_num.cast("string").cast("double")
            / sst.cast("string").cast("double")
        ).alias("r2"),
    )


_US_PER_S = 1_000_000
_LATE_BUCKET_S = 3600


@query(
    "events_lateness_profile",
    oracle=f"""
    WITH delayed AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             epoch_us(ts)
               + {_duck_hash_mod("event_id", "#arr", 121)} * {_US_PER_S}
               AS arrival
      FROM events
    ),
    arr AS (
      SELECT user_id, event_id, t,
             MAX(t) OVER (
               PARTITION BY user_id ORDER BY arrival, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS peak
      FROM delayed
    ),
    late AS (
      SELECT CASE WHEN peak IS NULL OR peak <= t THEN 0
                  ELSE (peak - t) // {_US_PER_S} END AS late_s
      FROM arr
    ),
    fold AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(*) FILTER (WHERE late_s = 0) AS BIGINT) AS n_inorder
      FROM late
    ),
    lv AS (
      SELECT late_s, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM late WHERE late_s > 0 GROUP BY late_s
    ),
    cum AS (
      SELECT late_s,
             SUM(cnt) OVER (ORDER BY late_s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM lv
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_late FROM lv),
    q AS (
      SELECT MAX(n_late) AS n_late,
             CAST(MIN(CASE WHEN cum * 100 >= 50 * n_late
                           THEN late_s END) AS BIGINT) AS p50_late_s,
             CAST(MIN(CASE WHEN cum * 100 >= 90 * n_late
                           THEN late_s END) AS BIGINT) AS p90_late_s,
             CAST(MIN(CASE WHEN cum * 100 >= 99 * n_late
                           THEN late_s END) AS BIGINT) AS p99_late_s,
             CAST(MAX(late_s) AS BIGINT) AS max_late_s
      FROM cum CROSS JOIN tot
    )
    SELECT f.n_events, f.n_inorder,
           CAST(f.n_inorder AS DOUBLE) / CAST(f.n_events AS DOUBLE)
             AS inorder_frac,
           q.n_late, q.p50_late_s, q.p90_late_s, q.p99_late_s, q.max_late_s
    FROM fold f CROSS JOIN q
    """,
)
def events_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit in event-id arrival order — see module
    docstring.  The running max is a user-partitioned window; late
    seconds collapse to a distinct-value frame whose quantile pass is
    the events_interarrival prefix shape (integer compares, hour
    buckets); quantiles are over LATE events only (the in-order mass
    is the separate exact fraction)."""
    ev = load_table(spark, sf_dir, "events")
    t = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    delayed = ev.select(
        "user_id",
        "event_id",
        t.alias("t"),
        (
            t
            + _spark_hash_mod(F.col("event_id"), "#arr", 121) * _US_PER_S
        ).alias("arrival"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("arrival").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = delayed.select("t", F.max("t").over(w).alias("peak"))
    late = arr.select(
        F.when(
            F.col("peak").isNull() | (F.col("peak") <= F.col("t")), F.lit(0)
        )
        .otherwise(F.expr(f"(peak - t) div {_US_PER_S}"))
        .alias("late_s")
    )
    fold = late.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count(F.when(F.col("late_s") == 0, 1))
        .cast("bigint")
        .alias("n_inorder"),
    )
    lv = (
        late.where(F.col("late_s") > 0)
        .groupBy("late_s")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = cum_before(lv, "late_s", "cnt", _LATE_BUCKET_S).select(
        "late_s", "cnt", (F.col("cum_before") + F.col("cnt")).alias("cum")
    )
    tot = lv.agg(F.sum("cnt").cast("bigint").alias("n_late"))
    quant = cum.crossJoin(F.broadcast(tot))

    def q(p100: int, alias: str):
        return F.min(
            F.when(
                F.col("cum") * 100 >= F.lit(p100) * F.col("n_late"),
                F.col("late_s"),
            )
        ).cast("bigint").alias(alias)

    qrow = quant.agg(
        F.max("n_late").alias("n_late"),
        q(50, "p50_late_s"), q(90, "p90_late_s"), q(99, "p99_late_s"),
        F.max("late_s").cast("bigint").alias("max_late_s"),
    )
    return fold.crossJoin(F.broadcast(qrow)).select(
        "n_events", "n_inorder",
        (
            F.col("n_inorder").cast("double") / F.col("n_events").cast("double")
        ).alias("inorder_frac"),
        "n_late", "p50_late_s", "p90_late_s", "p99_late_s", "max_late_s",
    )

"""User-lifecycle + telemetry-health operators (wave 5).

* `events_growth_accounting` — the growth-accounting identity (the
  Social-Capital MAU-accounting framework, at daily grain): every
  active user-day is exactly one of NEW (first-ever day), RETAINED
  (also active the previous day), or RESURRECTED (returning after a
  gap), and a CHURN event fires on the day after a user's last day of
  an activity streak.  The identity
  ``active(d) = new + retained + resurrected`` and
  ``churned(d) = active(d-1) - retained(d)`` is pinned by tests.
* `window_twap` — time-weighted average price/value per (user, day)
  (the finance/telemetry TWAP): each event's value weighted by the
  interval to the next event of the same day, denominated by the
  day's observed span.  Interval weights are exact integer
  microseconds; the weighted sum folds through exact decimal so the
  result is partition-order-free.
* `dq_freshness` — pipeline staleness audit: per event_type lag (in
  exact integer seconds) behind the corpus watermark (global max ts),
  flagged against a 1-hour SLA.  The "now" anchor is the corpus
  watermark, not wall-clock, so the check is deterministic and
  engine-portable.

Scale: growth accounting is one user-keyed window shuffle over the
DISTINCT (user, day) frame (sublinear in events) plus a day-keyed
rollup of |days| rows; TWAP is one (user, day)-keyed window + aggregate
over the fact; freshness is a |types|-row aggregate with a broadcast
1-row watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.numeric import dsum, o_dsum
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_FRESH_SLA_S = 3600


@query(
    "events_growth_accounting",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    w AS (
      SELECT user_id, day,
             MIN(day) OVER (PARTITION BY user_id) AS first_day,
             lag(day) OVER (PARTITION BY user_id ORDER BY day ASC) AS prev_day,
             lead(day) OVER (PARTITION BY user_id ORDER BY day ASC) AS next_day
      FROM ud
    ),
    mx AS (SELECT MAX(day) AS max_day FROM ud),
    cats AS (
      SELECT day,
             CAST(COUNT(*) FILTER (WHERE day = first_day) AS BIGINT)
               AS new_users,
             CAST(COUNT(*) FILTER (WHERE prev_day = day - 1) AS BIGINT)
               AS retained_users,
             CAST(COUNT(*) FILTER (WHERE day > first_day
                    AND (prev_day IS NULL OR prev_day < day - 1)) AS BIGINT)
               AS resurrected_users
      FROM w GROUP BY day
    ),
    churn AS (
      SELECT day + 1 AS day, CAST(COUNT(*) AS BIGINT) AS churned_users
      FROM w CROSS JOIN mx
      WHERE (next_day IS NULL OR next_day > day + 1) AND day + 1 <= mx.max_day
      GROUP BY day + 1
    )
    SELECT COALESCE(c.day, ch.day) AS day,
           COALESCE(c.new_users, 0) AS new_users,
           COALESCE(c.retained_users, 0) AS retained_users,
           COALESCE(c.resurrected_users, 0) AS resurrected_users,
           COALESCE(ch.churned_users, 0) AS churned_users
    FROM cats c FULL OUTER JOIN churn ch USING (day)
    """,
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new/retained/resurrected/churned user accounting — see
    module docstring.  One user-keyed window over the distinct
    (user, day) frame, a |days|-row rollup pair, and a tiny full-outer
    day join."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    wu = Window.partitionBy("user_id")
    wo = wu.orderBy(F.col("day").asc())
    w = ud.select(
        "user_id",
        "day",
        F.min("day").over(wu).alias("first_day"),
        F.lag("day").over(wo).alias("prev_day"),
        F.lead("day").over(wo).alias("next_day"),
    )
    cats = w.groupBy("day").agg(
        F.count(F.when(F.col("day") == F.col("first_day"), 1)).alias(
            "new_users"
        ),
        F.count(
            F.when(F.col("prev_day") == F.date_sub("day", 1), 1)
        ).alias("retained_users"),
        F.count(
            F.when(
                (F.col("day") > F.col("first_day"))
                & (
                    F.col("prev_day").isNull()
                    | (F.col("prev_day") < F.date_sub("day", 1))
                ),
                1,
            )
        ).alias("resurrected_users"),
    )
    mx = F.broadcast(ud.agg(F.max("day").alias("max_day")))
    churn = (
        w.crossJoin(mx)
        .where(
            (
                F.col("next_day").isNull()
                | (F.col("next_day") > F.date_add("day", 1))
            )
            & (F.date_add("day", 1) <= F.col("max_day"))
        )
        .groupBy(F.date_add("day", 1).alias("day"))
        .agg(F.count(F.lit(1)).alias("churned_users"))
    )
    z = F.lit(0).cast("long")
    return (
        cats.join(churn, "day", "full_outer")
        .select(
            "day",
            F.coalesce("new_users", z).alias("new_users"),
            F.coalesce("retained_users", z).alias("retained_users"),
            F.coalesce("resurrected_users", z).alias("resurrected_users"),
            F.coalesce("churned_users", z).alias("churned_users"),
        )
    )


@query(
    "window_twap",
    oracle=f"""
    WITH x AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             value, epoch_us(ts) AS t,
             epoch_us(lead(ts) OVER (PARTITION BY user_id,
                 CAST(date_trunc('day', ts) AS DATE)
                 ORDER BY ts ASC, event_id ASC)) AS t_next
      FROM events
    ),
    g AS (
      SELECT user_id, day,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS DECIMAL(38,0))
                 * (t_next - t)) AS lsum,
             CAST(SUM(t_next - t) AS BIGINT) AS span_us
      FROM x WHERE t_next IS NOT NULL
      GROUP BY user_id, day
    )
    SELECT user_id, day, n_events + 1 AS n_events,
           CAST(CAST(lsum AS VARCHAR) AS DOUBLE)
             / (CAST(span_us AS DOUBLE) * 100) AS twap
    FROM g
    """,
)
def window_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) time-weighted average value — see module
    docstring.  Each event weighted by the exact integer-microsecond
    interval to the day's next event (the last event closes the span);
    only user-days with ≥2 events have a defined span.  One
    (user, day)-keyed window + aggregate; weighted terms are
    per-row-deterministic doubles folded through exact decimal."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date").alias("day")
    base = ev.select("user_id", day, "value", "ts", "event_id")
    w = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    # NTZ-safe epoch micros (unix_micros rejects TIMESTAMP_NTZ; the
    # ntz-epoch diff needs no session timezone — the join_asof_nearest
    # lesson)
    x = (
        base.withColumn("ts_next", F.lead("ts").over(w))
        .select(
            "user_id",
            "day",
            "value",
            F.expr(
                "timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).alias("t"),
            F.expr(
                "timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts_next)"
            ).alias("t_next"),
        )
        .where(F.col("t_next").isNotNull())
    )
    # weighted terms fold EXACTLY: value_cents (floor(v·100+½) — the
    # repo-wide cents idiom, exact for the 2-decimal fixture values)
    # × Δt_us is a pure int64 product per row, so the numerator is
    # exact with NO per-row rounding at all — the earlier
    # seconds-denominated dsum diverged at sf0.1 on products whose
    # shortest repr ends at a scale-8 half (round-8 sweep finding;
    # same mechanism as attribution_time_decay), and a value-unit
    # floor ledger lost resolution on µs-gap rows.  Per-row bound:
    # 1e6 cents × 8.64e10 µs = 8.6e16 < int64; the group sum rides
    # DECIMAL(38,0) and exits via the varchar bridge.
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("decimal(38,0)")
    g = x.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_inner"),
        F.sum(cents * (F.col("t_next") - F.col("t"))).alias("lsum"),
        F.sum(F.col("t_next") - F.col("t")).alias("span_us"),
    )
    return g.select(
        "user_id",
        "day",
        (F.col("n_inner") + 1).alias("n_events"),
        (
            F.col("lsum").cast("string").cast("double")
            / (F.col("span_us").cast("double") * 100)
        ).alias("twap"),
    )


@query(
    "dq_freshness",
    oracle=f"""
    WITH per_type AS (
      SELECT event_type, MAX(ts) AS latest FROM events GROUP BY event_type
    ),
    wm AS (SELECT MAX(ts) AS watermark FROM events)
    SELECT p.event_type,
           (epoch_us(wm.watermark) - epoch_us(p.latest)) // 1000000
             AS lag_seconds,
           (epoch_us(wm.watermark) - epoch_us(p.latest)) // 1000000
             > {_FRESH_SLA_S} AS stale
    FROM per_type p CROSS JOIN wm
    """,
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type staleness behind the corpus watermark — see
    module docstring.  |types|-row aggregate + broadcast 1-row
    watermark; lag is exact integer seconds."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(F.max("ts").alias("latest"))
    wm = F.broadcast(ev.agg(F.max("ts").alias("watermark")))
    # floor-of-microseconds in BOTH engines (a SECOND-grain diff would
    # truncate on one side and round on the other)
    lag_s = F.expr(
        "timestampdiff(MICROSECOND, latest, watermark) div 1000000"
    )
    return per_type.crossJoin(wm).select(
        "event_type",
        lag_s.cast("long").alias("lag_seconds"),
        (lag_s > _FRESH_SLA_S).alias("stale"),
    )


@query(
    "events_trend_ols",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
               AS x,
             {o_dsum('value')} AS y
      FROM events GROUP BY event_type, x
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             {o_dsum('y')} AS sy,
             {o_dsum('CAST(x AS DOUBLE) * y')} AS sxy
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
           (sy - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
    FROM s
    """,
)
def events_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type revenue trend: closed-form OLS of daily value
    totals against the day index (the metric-trend line every analytics
    dashboard draws).  Distributed OLS is just power sums — n, Σx, Σx²,
    Σy, Σxy — folded once per group; slope and intercept are scalar
    arithmetic on the 5-row frame afterward.

    Cross-engine determinism: x is an exact integer day index, so Σx
    and Σx² are exact BIGINTs; the y folds ride exact decimal (dsum,
    summands ≲1e4 — far under the 1e9 bridge bound); slope/intercept
    are identical double expression chains in both engines.  Scale: two
    keyed aggregates (events → daily cells → |types| rows); nothing
    wider than the |types|×|days| daily frame ever shuffles twice."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
        )
        .cast("long")
        .alias("x"),
    ).agg(dsum("value", "y"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        dsum("y", "sy"),
        dsum(F.col("x").cast("double") * F.col("y"), "sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx").cast("double") - sxd * sxd
    )
    return s.select(
        "event_type",
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * sxd) / nd).alias("intercept"),
    )

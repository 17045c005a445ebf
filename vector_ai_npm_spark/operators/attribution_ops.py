"""Linear multi-touch attribution (wave 10).

`attribution_first_touch` (analytics_ops.py) credits each conversion's
value to ONE touchpoint; linear attribution — the other standard model —
splits it EQUALLY across every touch in the lookback window, the
marketing-analytics default when no position bias is assumed.  Each
purchase's value is divided over all click/view touches by the same
user in the preceding 7 days; purchases with no touch in the window
credit a synthetic ``direct`` channel (the row every attribution report
needs so channel totals reconcile to revenue).

Scale design (100 TB):

* The touch-to-purchase pairing is a USER-equi join with a time-range
  post-filter — never a global range join: the shuffle key is user_id,
  and per-user fan-out is (purchases × touches within 7 days), bounded
  by per-user activity rate × window length, a retention-policy
  constant (the sessionize/join_asof contract).  Hot users are AQE
  skew-splittable on the purchase side.
* The per-purchase touch count is a window over the pair frame keyed
  by the purchase (same shuffle), the per-touch credit is a scalar
  division, and the report is a channel-keyed aggregate of
  channel-cardinality size with map-side partials.
* Credits fold through the exact-decimal dsum so the report is
  bit-stable under partition order; total credited + direct ==
  total purchase value by construction (pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.numeric import dsum, o_dsum
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_LOOKBACK = "INTERVAL 7 DAY"
_TOUCH_TYPES = ("click", "view")


@query(
    "attribution_linear",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts, value
      FROM events WHERE event_type = 'purchase'
    ), t AS (
      SELECT user_id, ts AS tts, event_type AS channel
      FROM events WHERE event_type IN {_TOUCH_TYPES}
    ), pair AS MATERIALIZED (
      SELECT p.pid, p.value, t.channel,
             COUNT(*) OVER (PARTITION BY p.pid) AS n_touches
      FROM p JOIN t ON p.user_id = t.user_id
        AND t.tts < p.pts AND t.tts >= p.pts - {_LOOKBACK}
    ), credited AS (
      SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_events,
             {o_dsum('value / CAST(n_touches AS DOUBLE)')} AS credit
      FROM pair GROUP BY channel
    ), direct AS (
      SELECT 'direct' AS channel, CAST(COUNT(*) AS BIGINT) AS n_events,
             {o_dsum('value')} AS credit
      FROM p ANTI JOIN pair ON p.pid = pair.pid
    )
    SELECT * FROM credited
    UNION ALL
    SELECT * FROM direct WHERE n_events > 0
    """,
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel linear-attribution report over a 7-day lookback —
    see module docstring for the join/shuffle contract."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        F.col("ts").alias("pts"), "value",
    )
    t = ev.where(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        "user_id", F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    pair = (
        p.join(t, "user_id")
        .where(
            (F.col("tts") < F.col("pts"))
            & (F.col("tts") >= F.col("pts") - F.expr(_LOOKBACK))
        )
        .select(
            "pid", "value", "channel",
            F.count(F.lit(1))
            .over(Window.partitionBy("pid"))
            .alias("n_touches"),
        )
    )
    credited = pair.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(
            F.col("value") / F.col("n_touches").cast("double"), "credit"
        ),
    )
    direct = (
        p.join(pair.select("pid"), "pid", "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "credit"),
        )
        .select(F.lit("direct").alias("channel"), "n_events", "credit")
        .where(F.col("n_events") > 0)
    )
    return credited.unionByName(direct)

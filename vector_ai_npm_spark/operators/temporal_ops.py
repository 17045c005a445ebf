"""Temporal event operators, wave 3: tolerance-bounded as-of join and
event-stream time-window deduplication.

Round-7 additions to the B7/B8 temporal-join family (SURVEY §2B).
Reference scope note: the reference client (vector-client.ts) has no
temporal surface at all — these are north-star pipeline operators for
the `events` fixture stream, built on the same single-shuffle
union-and-carry machinery as `join_asof` (operators/relational.py:242).

Scale design (100 TB):

* `join_asof_tolerance` is the backward as-of join with a max-staleness
  bound — the shape every feature-store point-in-time lookup needs
  ("the latest click, but only if it is fresh enough").  Cost is
  IDENTICAL to the unbounded as-of: one user_id shuffle, one window
  sort, no range-join pair explosion; the tolerance is a post-carry
  filter on the carried timestamp, evaluated row-at-a-time in
  whole-stage codegen.
* `dedup_time_window` is at-least-once-delivery dedup: keep the FIRST
  event per (user, type) within each tumbling hour.  One shuffle keyed
  by (user, type, window-start) and a WindowGroupLimit top-1 — Spark
  plans rank-filter windows as a group-limit that never materializes
  the full per-key sort output.  This is the batch face of streaming
  `dropDuplicates` within watermark (streaming/queries.py stream_dedup);
  the two share the hour-bucket rule so backfill ≡ live.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

# 1-day max staleness for the tolerance as-of, sized from the fixture
# gap distribution (as-of click-gap median ~1.5 days at sf0.01): ~43%
# of purchases keep their click, so the bound demonstrably bites in
# both directions instead of degenerating to all-NULL or all-kept
_TOL = "INTERVAL 1 DAY"
_O_TOL = "INTERVAL 1 DAY"


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH purchases AS (
      SELECT * FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT * FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id AS purchase_event_id,
           p.user_id,
           CASE WHEN p.ts - c.ts <= {_O_TOL} THEN c.event_id END
             AS fresh_click_event_id
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8'': as-of join with a tolerance bound (pandas merge_asof
    ``tolerance=``): latest click at-or-before each purchase, kept only
    when it is at most 1 day stale — otherwise NULL.

    Same one-shuffle union-and-carry as `join_asof`, additionally
    carrying the matched click's timestamp in a struct so the staleness
    predicate runs AFTER the carry (a pre-filter would be wrong: a
    stale click must not let an older fresh-enough one win).  ntz − ntz
    interval comparison is exact microsecond arithmetic in both engines
    (fixture timestamps are µs-exact — ns remainders are all zero).
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts",
        F.struct(F.col("ts").alias("cts"), F.col("event_id").alias("cid"))
        .alias("click"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.lit(None).cast("struct<cts:timestamp_ntz,cid:bigint>").alias("click"),
        F.lit(1).alias("side"),
        F.col("event_id").alias("purchase_id"),
    )
    unioned = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", F.col("click.cid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "back", F.last("click", ignorenulls=True).over(w)
    )
    return carried.where(F.col("side") == 1).select(
        F.col("purchase_id").alias("purchase_event_id"),
        "user_id",
        F.when(
            (F.col("ts") - F.col("back.cts")) <= F.expr(_TOL),
            F.col("back.cid"),
        ).alias("fresh_click_event_id"),
    )


@query(
    "dedup_time_window",
    oracle="""
    SELECT event_id, user_id, event_type, ts
    FROM (
      SELECT event_id, user_id, event_type, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-stream time-window dedup: first event per (user, type)
    within each tumbling hour survives — the at-least-once-delivery /
    retry-storm collapse rule (batch face of streaming
    ``dropDuplicates`` within watermark).

    ONE shuffle keyed (user_id, event_type, hour); the rank<=1 filter
    plans as WindowGroupLimit (plan-gated in tests/test_wave7.py), so
    per-key state is one row and nothing but survivors flow downstream.
    Deterministic under duplicate timestamps via the event_id tiebreak.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("hour", F.col("ts"))
    ).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )

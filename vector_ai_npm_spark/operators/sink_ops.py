"""Dynamic partition overwrite sink (wave 9).

`sink_partition_overwrite` is the backfill write pattern every
partitioned lakehouse pipeline runs daily: re-process ONE day (late
data, a bug fix) and overwrite ONLY that day's partition, leaving the
other 29 untouched.  Two write modes exist in Spark and confusing them
destroys data:

* STATIC overwrite (the default): ``mode("overwrite")`` on a
  partitioned path deletes EVERY partition first, then writes whatever
  the incoming frame holds — a one-day backfill silently drops the
  other 29 days.
* DYNAMIC overwrite (``spark.sql.sources.partitionOverwriteMode =
  dynamic``): only partitions PRESENT in the incoming frame are
  replaced — the correct backfill semantics; everything else is
  untouched (what Hive calls insert overwrite ... partition, what
  Delta spells replaceWhere).

The query proves the dynamic path end-to-end: write all 30 event days
partitioned by day, then dynamic-overwrite day 15 with only that day's
deduplicated rows (first event per user×type×hour — the
dedup_time_window rule), re-read, and report per-day counts.  Day 15
comes back deduped, the other days come back full — which is exactly
what the oracle computes from the source table directly.

Scale design (100 TB): the overwrite job's cost is the ONE day being
rewritten, not the table (partition pruning applies to the write side);
the full-history initial load is a one-time cost any layout owns.  The
sink inherits sink_parquet's layout discipline (day-partitioned =
date-range pruning for readers).  Concurrency note: dynamic overwrite
is atomic per-partition via the Hadoop commit protocol v2 staging dirs;
cross-partition transactional atomicity needs a table format (Delta/
Iceberg) — documented boundary, same seam as the reference's Postgres
transactional store (vector-client.ts:306-308 ON CONFLICT upsert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_BACKFILL_DAY = "2024-01-15"


@query(
    "sink_partition_overwrite",
    oracle=f"""
    WITH deduped AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day
      FROM (
        SELECT ts, ROW_NUMBER() OVER (
                 PARTITION BY user_id, event_type, date_trunc('hour', ts)
                 ORDER BY ts, event_id) AS rn
        FROM events
        WHERE CAST(date_trunc('day', ts) AS DATE) = DATE '{_BACKFILL_DAY}'
      ) WHERE rn = 1
    ), full_days AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
      WHERE CAST(date_trunc('day', ts) AS DATE) <> DATE '{_BACKFILL_DAY}'
    )
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM (SELECT day FROM deduped UNION ALL SELECT day FROM full_days)
    GROUP BY day
    """,
)
def sink_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-partitioned write + DYNAMIC single-day backfill overwrite +
    read-back audit — see module docstring for the static/dynamic
    semantics this proves.

    The scratch location is a FIXED per-process path (keyed by PID so
    concurrent test workers don't collide), wiped before each run: a
    fresh ``mkdtemp`` per invocation would leak one full copy of the
    events table into /tmp per bench run, unbounded."""
    import os
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    )
    scratch = os.path.join(
        tempfile.gettempdir(), f"sink_dyn_overwrite_{os.getpid()}"
    )
    shutil.rmtree(scratch, ignore_errors=True)
    path = scratch + "/events"

    # initial full-history load (static overwrite of an empty path)
    ev.write.mode("overwrite").partitionBy("day").parquet(path)

    # backfill: day 15 only, deduplicated to first event per
    # user×type×hour (the dedup_time_window rule)
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("hour", "ts")
    ).orderBy("ts", "event_id")
    day15 = (
        ev.where(F.col("day") == F.lit(_BACKFILL_DAY).cast("date"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        day15.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    return (
        spark.read.parquet(path)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )

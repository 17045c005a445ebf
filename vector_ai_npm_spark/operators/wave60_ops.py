"""Wave 60: time-travel read + incremental diff over the versioned
store.

`store_time_travel_diff` — the hand-rolled versioned parquet store
(streaming/sinks.py: one `v{batch_id}` dir per committed micro-batch,
publish-by-rename, `_SUCCESS`-gated) has been written and compacted
by earlier faces; this face pins the READ side that makes versions
useful: reproducing a PAST state (`read_store(before=k)` — the
AS OF k semantics Delta/Iceberg sell) and computing an incremental
diff between two states without replaying inputs.

The contract: stream the events in two eras through the upsert merge
(the wave-57 split), then

  * the AS-OF read at the era boundary must equal the one-shot SQL
    aggregate over era 1 ONLY — byte-exact history, not an
    approximation of it;
  * latest-minus-as-of per-user deltas must equal the era-2-only
    aggregate — the incremental-consumer pattern (downstream jobs
    reading "what changed since version k" instead of the world);
  * users untouched in era 2 appear in NO diff row (the sparsity
    that makes incremental consumption cheaper than the world).

Scale shape: versions are parquet dirs; AS-OF and diff reads are
plain scans + one keyed join — no replay, no state reconstruction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_RUN1_FILES = 4
_RUN2_FILES = 2
_DEC = "decimal(30,8)"


@query(
    "store_time_travel_diff",
    oracle="""
    WITH cut AS (
      SELECT percentile_cont(0.5) WITHIN GROUP
               (ORDER BY epoch_us(ts)) AS c
      FROM events
    )
    SELECT e.user_id,
           CAST(CAST(CAST(SUM(CAST(e.value AS DECIMAL(30,8)))
                AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE) AS delta_value,
           CAST(COUNT(*) AS BIGINT) AS delta_events,
           TRUE AS asof_ok
    FROM events e, cut
    WHERE epoch_us(e.ts) > cut.c
    GROUP BY e.user_id
    """,
)
def store_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF + incremental diff — see module docstring.  Output rows
    are exactly the era-2-touched users with their deltas; `asof_ok`
    carries the byte-exact history check (as-of state ≡ era-1 one-shot
    aggregate) so a versioning defect flips every row."""
    import tempfile

    from vector_ai_npm_spark.streaming.sinks import (
        _store_versions,
        read_store,
        run_upsert_stream,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "ts")
    cut = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = tempfile.mkdtemp(prefix="timetravel_")
    ind, store, ckpt = f"{base}/in", f"{base}/store", f"{base}/ckpt"
    era1 = ev.where(us <= cut).select("user_id", "value")
    ev.where(us <= cut).select("user_id", "value").repartition(
        _RUN1_FILES
    ).write.parquet(ind)
    run_upsert_stream(spark, ind, store, ckpt)
    boundary = max(_store_versions(store)) + 1
    ev.where(us > cut).select("user_id", "value").repartition(
        _RUN2_FILES
    ).write.mode("append").parquet(ind)
    run_upsert_stream(spark, ind, store, ckpt)

    asof = read_store(spark, store, before=boundary)
    latest = read_store(spark, store)
    # byte-exact history: the as-of state equals era-1's one-shot agg
    era1_agg = era1.groupBy("user_id").agg(
        F.sum(F.col("value").cast(_DEC)).cast(_DEC).alias("tv"),
        F.count(F.lit(1)).alias("n"),
    )
    mismatches = (
        asof.join(era1_agg, "user_id", "full_outer")
        .where(
            (F.col("total_value_dec") != F.col("tv"))
            | (F.col("n_events") != F.col("n"))
            | F.col("total_value_dec").isNull()
            | F.col("tv").isNull()
        )
        .count()
    )
    asof_ok = mismatches == 0
    a = asof.select(
        "user_id",
        F.col("total_value_dec").alias("v0"),
        F.col("n_events").alias("n0"),
    )
    diff = (
        latest.join(a, "user_id", "left")
        .select(
            "user_id",
            (
                F.col("total_value_dec")
                - F.coalesce(F.col("v0"), F.lit(0).cast(_DEC))
            ).cast(_DEC).alias("delta_dec"),
            (F.col("n_events") - F.coalesce(F.col("n0"), F.lit(0))).alias(
                "delta_events"
            ),
        )
        .where(F.col("delta_events") > 0)
    )
    return diff.select(
        "user_id",
        F.col("delta_dec").cast("decimal(38,8)").cast("string")
        .cast("double").alias("delta_value"),
        F.col("delta_events").cast("bigint").alias("delta_events"),
        F.lit(bool(asof_ok)).alias("asof_ok"),
    )

"""Wave 57: streaming checkpoint RESTART — exactly-once source
tracking across process restarts, driver-checked.

Every streaming face so far ran inside one query lifetime; the
operational contract that matters in production is the RESTART: a new
query object pointed at the SAME checkpoint must resume from the
source offsets the previous run committed — new input processes, old
input does not, and the store converges to the one-shot batch answer
bit-for-bit.  This face runs the versioned upsert merge
(streaming/sinks.py — the at-least-once-idempotent foreachBatch
design) through TWO availableNow query lifetimes with an input append
between them, then pins:

  * run 1 published exactly one store version per input file (4);
  * the restarted run published exactly the NEW files' versions (2),
    ids CONTINUING the committed batch sequence — i.e. zero
    reprocessing: the checkpoint, not the input listing, decided what
    to read;
  * final per-user totals hash-equal the one-shot SQL aggregate over
    ALL events (the exact-decimal state discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_RUN1_FILES = 4
_RUN2_FILES = 2


@query(
    "stream_checkpoint_restart",
    oracle=f"""
    SELECT user_id,
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DECIMAL(38,8))
                AS VARCHAR) AS DOUBLE) AS total_value,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST({_RUN1_FILES} AS BIGINT) AS run1_batches,
           CAST({_RUN2_FILES} AS BIGINT) AS resumed_batches,
           TRUE AS no_reprocess
    FROM events
    GROUP BY user_id
    """,
)
def stream_checkpoint_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-lifetime restart face — see module docstring.  Events split
    at the median timestamp: era 1 streams first (4 files → versions
    0-3), the query TERMINATES, era 2 lands in the input dir, and a
    brand-new query on the same checkpoint resumes (2 files → versions
    4-5 exactly).  no_reprocess derives from the published version ids
    themselves — any re-read of era-1 files would mint extra versions
    or shift the resumed ids and flip the booleans/hash."""
    import tempfile

    from vector_ai_npm_spark.streaming.sinks import (
        _store_versions,
        final_totals,
        run_upsert_stream,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "ts")
    cut = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = tempfile.mkdtemp(prefix="ckpt_restart_")
    ind, store, ckpt = f"{base}/in", f"{base}/store", f"{base}/ckpt"
    ev.where(us <= cut).select("user_id", "value").repartition(
        _RUN1_FILES
    ).write.parquet(ind)
    run_upsert_stream(spark, ind, store, ckpt)
    v1 = _store_versions(store)
    ev.where(us > cut).select("user_id", "value").repartition(
        _RUN2_FILES
    ).write.mode("append").parquet(ind)
    run_upsert_stream(spark, ind, store, ckpt)
    v2 = _store_versions(store)
    resumed = [v for v in v2 if v not in v1]
    no_reprocess = (
        len(v1) == _RUN1_FILES
        and len(resumed) == _RUN2_FILES
        and min(resumed) == max(v1) + 1
    )
    return final_totals(spark, store).select(
        "user_id",
        "total_value",
        "n_events",
        F.lit(len(v1)).cast("bigint").alias("run1_batches"),
        F.lit(len(resumed)).cast("bigint").alias("resumed_batches"),
        F.lit(bool(no_reprocess)).alias("no_reprocess"),
    )

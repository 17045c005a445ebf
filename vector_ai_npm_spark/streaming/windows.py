"""B25–B28 — event-time windowing, shared between batch and streaming.

Structured Streaming's contract is that a windowed aggregation is the
same *query* in batch and incremental execution; we exploit that by
defining every windowed transform once as a DataFrame function and
running it (a) on the batch events table for the DuckDB oracle and
(b) under readStream in tests/test_streaming.py (file source +
processAllAvailable), asserting identical results.

Scale notes: event-time windows shuffle on (window, keys); watermarks
bound state. session_window state grows with open sessions per key —
the watermark is what lets Spark evict; both are set here the way a
production job would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def tumbling_counts(events: DataFrame, width: str = "1 minute") -> DataFrame:
    """B25: events per event_type per tumbling window."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def sliding_counts(events: DataFrame, width: str = "10 minutes",
                   slide: str = "5 minutes") -> DataFrame:
    """B26a: sliding windows — each event lands in width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_windows(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """B26b: per-user session windows (gap-based)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("first_ts").cast("timestamp_ntz").alias("session_start"),
            F.col("last_ts").cast("timestamp_ntz").alias("session_last"),
            "n_events",
        )
    )


def late_events(
    events: DataFrame, lateness: str = "10 minutes",
    bucket_width: int = 100_000,
) -> DataFrame:
    """B27 batch equivalent of the watermark rule: an event is late if it
    arrives (arrival order = event_id) after the running max event time
    has moved more than `lateness` past its timestamp. Under readStream
    the same rule is `withWatermark('ts', lateness)` dropping the row.

    The prefix max is TWO-LEVEL (the concurrency_sweep discipline), not
    one global ordered window: a single ``Window.orderBy(event_id)``
    over the corpus moves every row into one task — the measured
    per-key-ordered-window wall from the §4j skew study, and the shape
    the round-7 plan gate (tests/test_plans.py unpartitioned-window
    sweep) rejects.  Instead: (1) bucket arrival order into contiguous
    event_id ranges and take each bucket's prefix max with a
    PARTITIONED window; (2) compute per-bucket maxima (an aggregate —
    one row per bucket) and carry the strictly-prior-bucket running max
    across that bucket-count frame with the only unpartitioned window,
    bounded by construction; (3) broadcast the carries back and combine
    ``high_water = greatest(prior_buckets_max, within_bucket_prefix)``.
    Identical semantics (max is associative over the order-respecting
    bucket split); corpus rows never collapse to one task."""
    b = (F.col("event_id") / F.lit(bucket_width)).cast("long")
    ev = events.withColumn("bucket", b)
    w_in = (
        W.partitionBy("bucket")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    bmax = ev.groupBy("bucket").agg(F.max("ts").alias("bucket_max"))
    w_carry = (
        W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    )
    carries = bmax.select(
        "bucket", F.max("bucket_max").over(w_carry).alias("prior_max")
    )
    return (
        ev.withColumn("local_hw", F.max("ts").over(w_in))
        .join(F.broadcast(carries), "bucket")
        .withColumn("high_water", F.greatest("local_hw", "prior_max"))
        .where(F.col("ts") < F.col("high_water") - F.expr(f"INTERVAL {lateness}"))
        .select("event_id", "ts", "user_id", "event_type")
    )


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """B28 batch equivalent of dropDuplicatesWithinWatermark: exactly one
    row per dedup key, deterministically the min event_id (streaming
    keeps the first arrival; arrival order in the fixture is event_id)."""
    key = [F.col("user_id"), F.col("event_type"),
           F.date_trunc("minute", "ts").cast("timestamp_ntz").alias("minute")]
    return (
        events.groupBy(*key)
        .agg(F.min("event_id").alias("event_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("event_id", "user_id", "event_type", "minute", "n_dups")
    )


def topk_event_types(counts: DataFrame, k: int = 3) -> DataFrame:
    """B25+: top-k event types per window, applied OVER the windowed
    counts. Ranking is not an incremental-streaming operator (window
    functions are rejected under readStream), so production jobs rank
    in the serving layer / foreachBatch over the aggregation state —
    this function is that post-aggregation, shared by the batch oracle
    face and the streaming test, which ranks the memory-sink state
    after processAllAvailable. Partitioned by window ⇒ bounded frames
    (≤ #event types per window), never a global sort."""
    wr = W.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .where(F.col("rnk") <= k)
        .select("window_start", "event_type", "n_events", "rnk")
    )


def segment_windowed_totals(events: DataFrame, customer: DataFrame,
                            width: str = "1 minute") -> DataFrame:
    """B26+: STREAM-STATIC enrichment — events joined to the static
    customer dimension (market segment) before the windowed aggregate.
    Structured Streaming runs stream-static inner joins stateless: the
    static side is broadcast to every micro-batch, no join state at
    all, so this is the canonical shape for attaching slowly-changing
    reference data to a live stream. Defined once, run in batch for the
    DuckDB oracle and under readStream in tests/test_streaming.py.

    The value sum goes through the exact-decimal fold so the streaming
    result is bit-identical to the one-shot SQL aggregate."""
    seg = F.broadcast(
        customer.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return (
        events.join(seg, "user_id")
        .groupBy(F.window("ts", width).alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,8)"))
            .cast("decimal(38,8)")
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "segment",
            "n_events",
            "total_value",
        )
    )

"""Registry entries for streaming-shaped operators (B25–B28), run in
batch mode for the oracle; tests/test_streaming.py re-runs the same
transforms under readStream and asserts equality."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.streaming.windows import (
    dedup_within_watermark,
    late_events,
    segment_windowed_totals,
    session_windows,
    sliding_counts,
    tumbling_counts,
)


@query(
    "stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL 1 MINUTE, ts) AS window_start,
           time_bucket(INTERVAL 1 MINUTE, ts) + INTERVAL 1 MINUTE AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25: 1-minute tumbling counts per event type."""
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@query(
    "stream_sliding",
    oracle="""
    WITH w AS (
      SELECT event_type, ts,
             unnest([time_bucket(INTERVAL 5 MINUTE, ts),
                     time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE])
               AS window_start
      FROM events
    )
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM w GROUP BY 1, 2, 3
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26a: 10-minute windows sliding every 5 — every event belongs to
    exactly two windows (floor5(ts) and floor5(ts)−5min), which is what
    the oracle unnests."""
    return sliding_counts(load_table(spark, sf_dir, "events"))


@query(
    "stream_session",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 5 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM o
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_last,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_no
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26b: 5-minute-gap session windows per user; the oracle is the
    classic gap-and-island SQL (lag → new-session flag → running sum)."""
    return session_windows(load_table(spark, sf_dir, "events"))


@query(
    "stream_watermark",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM (
      SELECT event_id, ts, user_id, event_type,
             MAX(ts) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS high_water
      FROM events
    )
    WHERE ts < high_water - INTERVAL 10 MINUTE
    """,
)
def stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27: late-data rule (>10 min behind the running max event time in
    arrival order) — the batch-checkable core of withWatermark."""
    return late_events(load_table(spark, sf_dir, "events"))


@query(
    "stream_dedup",
    oracle="""
    SELECT CAST(MIN(event_id) AS BIGINT) AS event_id,
           user_id, event_type,
           date_trunc('minute', ts) AS minute,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM events
    GROUP BY user_id, event_type, date_trunc('minute', ts)
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28: stateful dedup on (user_id, event_type, minute) — batch
    equivalent keeps the deterministic first arrival (min event_id)."""
    return dedup_within_watermark(load_table(spark, sf_dir, "events"))


@query(
    "stream_stateful_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DECIMAL(38,8))
                AS VARCHAR) AS DOUBLE) AS total_value,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28+/custom-stateful: per-user running totals. Batch face here
    (exact-decimal sum for the oracle hash); the applyInPandasWithState
    streaming face is exercised in tests/test_streaming.py and must
    converge to these same totals."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,8)"))
        .cast("decimal(38,8)")
        .cast("double")
        .alias("total_value"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "stream_join_interval",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id, c.ts AS click_ts, p.ts AS purchase_ts,
           p.value AS amount
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 4 HOUR
    """,
)
def stream_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26+: stream-stream interval join (click→purchase attribution
    within 4 h). Batch face of streaming.joins.attribute_purchases; the
    double-watermarked readStream face runs in tests/test_streaming.py
    (inner joins emit on match, so batch ≡ stream)."""
    from vector_ai_npm_spark.streaming.joins import (
        attribute_purchases,
        split_clicks_purchases,
    )

    clicks, purchases = split_clicks_purchases(load_table(spark, sf_dir, "events"))
    return attribute_purchases(clicks, purchases)


@query(
    "stream_foreach_upsert",
    oracle="""
    SELECT user_id,
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DECIMAL(38,8))
                AS VARCHAR) AS DOUBLE) AS total_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def stream_foreach_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28+: a REAL end-to-end Structured Streaming run inside the
    query — events tailed one file per trigger through a foreachBatch
    incremental merge into a versioned parquet store — whose final store
    content hash-matches the one-shot SQL aggregate. Exact-decimal state
    (streaming.sinks) is what makes a 4-micro-batch accumulation
    bit-identical to the single-pass oracle."""
    import tempfile

    from vector_ai_npm_spark.streaming.sinks import final_totals, run_upsert_stream

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    base = tempfile.mkdtemp(prefix="upsert_store_")
    input_dir, store_dir, ckpt = (f"{base}/in", f"{base}/store", f"{base}/ckpt")
    ev.repartition(4).write.parquet(input_dir)
    run_upsert_stream(spark, input_dir, store_dir, ckpt)
    # final select matches the oracle's column set exactly
    return final_totals(spark, store_dir).select("user_id", "total_value", "n_events")


@query(
    "stream_static_enrich",
    oracle="""
    SELECT time_bucket(INTERVAL 1 MINUTE, e.ts) AS window_start,
           time_bucket(INTERVAL 1 MINUTE, e.ts) + INTERVAL 1 MINUTE
             AS window_end,
           c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(CAST(SUM(CAST(e.value AS DECIMAL(30,8)))
                AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2, 3
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26+: stream-static enrichment join — events attached to the
    static customer dimension (market segment), then 1-minute tumbling
    totals per segment. The stream-static inner join is STATELESS in
    Structured Streaming (static side broadcast per micro-batch, no
    watermark, no join state) — the canonical reference-data-attach
    shape; batch face here for the oracle, readStream convergence in
    tests/test_streaming.py."""
    return segment_windowed_totals(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
    )


@query(
    "stream_tws_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DECIMAL(38,8))
                AS VARCHAR) AS DOUBLE) AS total_value,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS last_us
    FROM events
    GROUP BY user_id
    """,
)
def stream_tws_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28+/custom-stateful, driver-checkable END-TO-END: events tailed
    one file per trigger through the CAPABILITY-ROUTED stateful face —
    transformWithStateInPandas where the protobuf wheel is installed,
    applyInPandasWithState otherwise (streaming.stateful.
    user_totals_stream_exact; the round-5 verdict's documented gate with
    a driver-checkable fallback) — then the last emission per user
    hash-matched against the one-shot SQL aggregate.

    What makes a multi-micro-batch stream hash-match SQL: state is
    EXACT integers (count, 1e-8 value units quantized per row exactly
    like both engines' double→DECIMAL(30,8) cast, max event-time
    micros), so accumulation order across batches cannot move a bit;
    the final select renders units to a decimal string and casts to
    double — the same varchar route the oracle takes."""
    import tempfile

    from vector_ai_npm_spark.streaming.stateful import user_totals_stream_exact

    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "ts")
    base = tempfile.mkdtemp(prefix="tws_totals_")
    ev.repartition(4).write.parquet(f"{base}/in")
    schema = spark.read.parquet(f"{base}/in").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
    )
    qname = f"tws_totals_{abs(hash(base)) % 10**9}"
    q = (
        user_totals_stream_exact(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    from pyspark.sql import functions as F

    final = (
        spark.table(qname)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_units", "n_events").alias("total_units"),
            F.max("last_us").alias("last_us"),
        )
    )
    # exact units -> decimal string -> double: bit-identical to the
    # oracle's DECIMAL(38,8) -> VARCHAR -> DOUBLE rendering
    return final.select(
        "user_id",
        "n_events",
        F.expr(
            "CAST(concat(CASE WHEN total_units < 0 THEN '-' ELSE '' END, "
            "CAST(abs(total_units) DIV 100000000 AS STRING), '.', "
            "lpad(CAST(abs(total_units) % 100000000 AS STRING), 8, '0')) "
            "AS DOUBLE)"
        ).alias("total_value"),
        "last_us",
    )


def _crawl_dedup_oracle() -> str:
    from vector_ai_npm_spark.dedup.queries import (
        _BAND_KEYS_DUCK,
        _DUCK_SHINGLES,
        _duck_minhash,
        N_MINHASH,
    )

    return (
        "WITH sh AS (SELECT doc_id, " + _DUCK_SHINGLES + """ AS shingles
      FROM documents),
    sig AS (SELECT doc_id, """
        + ", ".join(f"{_duck_minhash(i)} AS mh{i}" for i in range(N_MINHASH))
        + """ FROM sh),
    bands AS (
      SELECT doc_id, unnest(["""
        + ", ".join(_BAND_KEYS_DUCK)
        + """]) AS band_key FROM sig),
    rej AS (
      SELECT DISTINCT b.doc_id
      FROM bands a JOIN bands b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT d.doc_id,
           d.doc_id NOT IN (SELECT doc_id FROM rej) AS accepted
    FROM documents d
    """
    )


@query("stream_dedup_incremental", oracle=_crawl_dedup_oracle())
def stream_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18+B28 flagship composite: the STREAMING crawl-ingest dedup
    loop, end-to-end and driver-checked. Documents tail in one file per
    trigger; each foreachBatch merge LSH-checks the batch against the
    versioned band store built so far and publishes accept/reject
    decisions (streaming.crawl_dedup — first-id-canonical rule, with
    late-arriving smaller ids DEMOTING previously-accepted docs, so the
    final store is identical for any micro-batch arrival order). The
    oracle recomputes the same rule in one shot: a doc is accepted iff
    no smaller-doc_id document shares an LSH band — same shingles, same
    minhash folds, same band keys as the whole batch dedup family."""
    import tempfile

    from vector_ai_npm_spark.streaming.crawl_dedup import (
        final_decisions,
        run_crawl_dedup_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="crawl_dedup_")
    docs.repartition(4).write.parquet(f"{base}/in")
    run_crawl_dedup_stream(
        spark, f"{base}/in", f"{base}/bands", f"{base}/decisions",
        f"{base}/ckpt",
    )
    return final_decisions(spark, f"{base}/decisions")


@query(
    "stream_topk",
    oracle="""
    WITH c AS (
      SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT window_start, event_type, n_events,
             row_number() OVER (
               PARTITION BY window_start
               ORDER BY n_events DESC, event_type ASC
             ) AS rnk
      FROM c
    )
    SELECT window_start, event_type, n_events, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3
    """,
)
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25+: top-3 event types per 5-minute tumbling window — the
    trending-items dashboard shape. The windowed count is the
    streaming-legal aggregation (readStream ≡ batch pinned in
    tests/test_streaming.py); the rank is the documented
    post-aggregation (windows.topk_event_types) over the bounded
    (window, type) state, per-window frames ≤ #event types."""
    from vector_ai_npm_spark.streaming.windows import topk_event_types

    counts = tumbling_counts(
        load_table(spark, sf_dir, "events"), width="5 minutes"
    ).select("window_start", "event_type", "n_events")
    return topk_event_types(counts, k=3)

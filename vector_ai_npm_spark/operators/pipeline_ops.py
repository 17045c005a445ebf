"""Pipeline-shaped operators: sessionization and CDC/SCD2 merge.

Reference context: the reference has no notion of sessions or change
capture (its store is insert-only, vector-client.ts:310-341); both are
table-stakes operators for the event/training-data pipelines this
engine targets, so they live in the north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

SESSION_GAP = "30 minutes"


@query(
    "sessionize",
    oracle="""
    WITH x AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT user_id, event_id, ts,
           CAST(SUM(is_start) OVER (PARTITION BY user_id
                ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_seq
    FROM x
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26-batch: per-EVENT session assignment (gaps-and-islands) — the
    row-level complement of stream_session's per-window aggregates: a
    session starts at the first event or after a >30 min silence, and
    every event carries its (user_id, session_seq) key.

    Plan: ONE shuffle on user_id serves both windows (lag + running
    sum share the partition/order). Deterministic tiebreak on event_id
    keeps equal timestamps stable across engines. At 100 TB: windows
    within user_id never cross partitions, so this scales with the
    user-key spread; a single whale user is the only skew risk (then:
    pre-split by day and stitch boundaries)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    is_start = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") > F.lag("ts").over(w) + F.expr(f"INTERVAL {SESSION_GAP}")),
        1,
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(is_start).over(wrun).cast("long").alias("session_seq"),
    )


# --------------------------------------------------------------------------
# CDC → SCD2 merge
# --------------------------------------------------------------------------

_BASE_TS = "TIMESTAMP '2020-01-01 00:00:00'"
_CHANGE_TS = "TIMESTAMP '2024-06-01 00:00:00'"


def _synth_changes(customer: DataFrame) -> DataFrame:
    """Deterministic change batch derived from the fixture: every 10th
    key is an update (+100 balance), every 17th a delete, and one new
    key per 50th existing (offset by 1,000,000) an insert."""
    upd = (
        customer.where((F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") % 17 != 0))
        .select(
            "c_custkey",
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            "c_mktsegment",
            F.lit("U").alias("op"),
        )
    )
    dele = customer.where(F.col("c_custkey") % 17 == 0).select(
        "c_custkey", F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"), F.lit("D").alias("op"),
    )
    ins = customer.where(F.col("c_custkey") % 50 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit("I").alias("op"),
    )
    return upd.unionByName(dele).unionByName(ins)


@query(
    "cdc_scd2_merge",
    oracle=f"""
    WITH changes AS (
      SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment, 'U' AS op
      FROM customer WHERE c_custkey % 10 = 0 AND c_custkey % 17 <> 0
      UNION ALL
      SELECT c_custkey, NULL, NULL, 'D' FROM customer WHERE c_custkey % 17 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 0.0, 'NEW', 'I'
      FROM customer WHERE c_custkey % 50 = 0
    ),
    -- untouched rows stay open
    kept AS (
      SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment,
             {_BASE_TS} AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM changes ch
                        WHERE ch.c_custkey = c.c_custkey)
    ),
    -- updated/deleted rows close at the change timestamp
    closed AS (
      SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment,
             {_BASE_TS} AS valid_from,
             {_CHANGE_TS} AS valid_to, FALSE AS is_current
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM changes ch
                    WHERE ch.c_custkey = c.c_custkey)
    ),
    -- updates and inserts open a new version
    opened AS (
      SELECT c_custkey, c_acctbal, c_mktsegment,
             {_CHANGE_TS} AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
      FROM changes WHERE op IN ('U', 'I')
    )
    SELECT * FROM kept UNION ALL SELECT * FROM closed
    UNION ALL SELECT * FROM opened
    """,
)
def cdc_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star CDC: apply an upsert/delete change batch to a
    dimension as SLOWLY CHANGING DIMENSION TYPE 2 — history preserved
    by closing the old version (valid_to = change ts) and opening a new
    one, deletes close without reopening, untouched rows pass through.

    Plan: ONE shuffle-join of base against changes (semi for kept via
    anti, the rest by join type) — expressed as a single outer join +
    conditional projection would also work; semi/anti keeps each leg's
    semantics auditable. At scale this is the merge-on-read pattern:
    the base is immutable parquet, each change batch writes a new
    version (see streaming.sinks for the versioned-publish layout);
    table formats (Delta/Iceberg/Hudi) productionize exactly this plan
    behind MERGE INTO."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    changes = _synth_changes(c)
    base_ts = F.expr(_BASE_TS)
    change_ts = F.expr(_CHANGE_TS)
    null_ts = F.lit(None).cast("timestamp")
    keys = changes.select("c_custkey")
    kept = c.join(keys, "c_custkey", "left_anti").select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        base_ts.alias("valid_from"), null_ts.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closed = c.join(keys, "c_custkey", "left_semi").select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        base_ts.alias("valid_from"), change_ts.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = changes.where(F.col("op").isin("U", "I")).select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        change_ts.alias("valid_from"), null_ts.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return kept.unionByName(closed).unionByName(opened)


@query(
    "rollup_time_multires",
    oracle="""
    WITH b AS (
      SELECT event_type, value,
             time_bucket(INTERVAL 1 MINUTE, ts) AS m,
             time_bucket(INTERVAL 1 HOUR, ts)   AS h,
             time_bucket(INTERVAL 1 DAY, ts)    AS d
      FROM events
    )
    SELECT CASE WHEN m IS NOT NULL THEN '1m'
                WHEN h IS NOT NULL THEN '1h' ELSE '1d' END AS resolution,
           COALESCE(m, h, d) AS bucket_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(30,8)))
                AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE) AS total_value
    FROM b
    GROUP BY GROUPING SETS ((m, event_type), (h, event_type), (d, event_type))
    """,
)
def rollup_time_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup (the hypertable continuous-aggregate
    pattern): minute, hour, and day buckets per event_type computed in
    ONE pass via GROUPING SETS — Catalyst plans a single Expand (3×
    row replication of the narrow projection) into one shuffle/partial
    aggregate, vs three separate scans of a 100 TB fact feed. This is
    the write-side shape for serving dashboards at several zoom levels
    from one job; sums use the exact-decimal fold (functions.numeric)
    so every resolution is bit-consistent with its finer parents."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        "value",
        F.date_trunc("minute", "ts").alias("m"),
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
    )
    b.createOrReplaceTempView("rollup_multires_b")
    return spark.sql(
        """
        SELECT CASE WHEN m IS NOT NULL THEN '1m'
                    WHEN h IS NOT NULL THEN '1h' ELSE '1d' END AS resolution,
               COALESCE(m, h, d) AS bucket_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(CAST(SUM(CAST(value AS DECIMAL(30,8)))
                    AS DECIMAL(30,8)) AS DOUBLE) AS total_value
        FROM rollup_multires_b
        GROUP BY GROUPING SETS ((m, event_type), (h, event_type), (d, event_type))
        """
    )


@query(
    "funnel_steps",
    oracle="""
    WITH s1 AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
      FROM events GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, s1.first_view,
             MIN(CASE WHEN e.event_type = 'click'
                       AND e.ts > s1.first_view THEN e.ts END) AS first_click
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      GROUP BY e.user_id, s1.first_view
    ), s3 AS (
      SELECT e.user_id, s2.first_view, s2.first_click,
             MIN(CASE WHEN e.event_type = 'purchase'
                       AND e.ts > s2.first_click THEN e.ts END)
               AS first_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      GROUP BY e.user_id, s2.first_view, s2.first_click
    )
    SELECT user_id, first_view, first_click, first_purchase,
           CAST(CASE WHEN first_purchase IS NOT NULL THEN 3
                     WHEN first_click IS NOT NULL THEN 2
                     WHEN first_view IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_depth
    FROM s3
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel analysis (view → click-after-view →
    purchase-after-click) per user — the product-analytics shape that
    needs ORDERED stage semantics, not independent filters (a click
    before the first view must not count).

    Plan: three chained per-user window minima over the SAME partition
    key — Catalyst plans consecutive Window nodes over one exchange, so
    the whole funnel costs ONE shuffle of the events feed regardless of
    stage count; per-user state is three timestamps. The oracle spells
    the identical stages as chained grouped CTEs."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    with_v = ev.withColumn(
        "first_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    with_c = with_v.withColumn(
        "first_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("first_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    with_p = with_c.withColumn(
        "first_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("first_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    return (
        with_p.groupBy("user_id")
        .agg(
            F.first("first_view").alias("first_view"),
            F.first("first_click").alias("first_click"),
            F.first("first_purchase").alias("first_purchase"),
        )
        .select(
            "user_id",
            "first_view",
            "first_click",
            "first_purchase",
            F.when(F.col("first_purchase").isNotNull(), 3)
            .when(F.col("first_click").isNotNull(), 2)
            .when(F.col("first_view").isNotNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("funnel_depth"),
        )
    )


@query(
    "window_moving_median",
    oracle="""
    SELECT event_id, user_id, value,
           median(value) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
           ) AS trailing_median
    FROM events
    """,
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exact median per user (last 10 events) — the robust
    baseline for streaming anomaly detection, where a mean is hostage
    to the very outliers being hunted. Exact median over a bounded ROWS
    frame is cheap (frame state ≤ 10 values) and engine-stable: both
    engines interpolate the even-count midpoint with the same (a+b)/2,
    pinned bit-equal by the agg_percentile family. One shuffle on the
    user key; total order inside the frame via the (ts, event_id)
    tiebreak so the frame contents are deterministic under ties.
    (Spark's `median` rejects window frames; `percentile(x, 0.5)` is the
    identical interpolated computation and accepts them.)"""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-9, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.expr("percentile(value, 0.5)").over(w).alias("trailing_median"),
    )


@query(
    "table_diff",
    oracle="""
    WITH changes AS (
      SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment, 'U' AS op
      FROM customer WHERE c_custkey % 10 = 0 AND c_custkey % 17 <> 0
      UNION ALL
      SELECT c_custkey, NULL, NULL, 'D' FROM customer WHERE c_custkey % 17 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 0.0, 'NEW', 'I'
      FROM customer WHERE c_custkey % 50 = 0
    ),
    nxt AS (
      SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM changes ch
                        WHERE ch.c_custkey = c.c_custkey)
      UNION ALL
      SELECT c_custkey, c_acctbal, c_mktsegment
      FROM changes WHERE op IN ('U', 'I')
    )
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'added'
                WHEN n.c_custkey IS NULL THEN 'removed'
                ELSE 'changed' END AS diff_status,
           o.c_acctbal AS bal_old, n.c_acctbal AS bal_new,
           o.c_mktsegment AS seg_old, n.c_mktsegment AS seg_new
    FROM customer o FULL OUTER JOIN nxt n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
       OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
    """,
)
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / change-data GENERATION — the inverse of
    `cdc_scd2_merge`: given two table versions, emit the change feed
    (added / removed / changed rows with old+new values). The "next"
    snapshot is derived deterministically from the same change recipe
    the SCD2 merge uses (:func:`_synth_changes`), so the emitted feed
    must round-trip it exactly.

    Plan: ONE full-outer shuffle join on the primary key + a residual
    filter for value equality (null-safe, so NULL→value transitions
    surface). Unchanged rows — the overwhelming majority at 100 TB —
    are dropped by the residual BEFORE any downstream fan-out; with
    both snapshots bucketed on the key (the join_bucketed layout) the
    diff plans with zero exchanges. This is how table formats compute
    change feeds between versions when no CDC log was captured."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    changes = _synth_changes(c)
    nxt = (
        c.join(changes.select("c_custkey"), "c_custkey", "left_anti")
        .unionByName(
            changes.where(F.col("op").isin("U", "I")).drop("op")
        )
    )
    return diff_snapshots(
        c, nxt, key="c_custkey", compare_cols=["c_acctbal", "c_mktsegment"]
    ).select(
        "c_custkey",
        "diff_status",
        F.col("c_acctbal_old").alias("bal_old"),
        F.col("c_acctbal_new").alias("bal_new"),
        F.col("c_mktsegment_old").alias("seg_old"),
        F.col("c_mktsegment_new").alias("seg_new"),
    )


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Generic change-feed generation between two snapshots of a keyed
    table (the engine-facade entry; `table_diff` wires in the fixture):
    one full-outer join on ``key``, a null-safe residual that drops
    unchanged rows before anything fans out, and per-column old/new
    value pairs (``<col>_old`` / ``<col>_new``) for the survivors."""
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    differs = F.col(f"o.{key}").isNull() | F.col(f"n.{key}").isNull()
    for c in compare_cols:
        differs = differs | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    out = [
        F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
        F.when(F.col(f"o.{key}").isNull(), "added")
        .when(F.col(f"n.{key}").isNull(), "removed")
        .otherwise("changed")
        .alias("diff_status"),
    ]
    for c in compare_cols:
        out.append(F.col(f"o.{c}").alias(f"{c}_old"))
        out.append(F.col(f"n.{c}").alias(f"{c}_new"))
    return joined.where(differs).select(*out)


@query(
    "dq_checks",
    oracle="""
    SELECT 'customer_pk_unique' AS check_name,
           CAST((SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer)
             AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'lineitem_pk_unique',
           CAST(COUNT(*) - COUNT(DISTINCT l_orderkey * 10 + l_linenumber)
             AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_shipdate_in_range',
           CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01'
                           OR l_shipdate >= TIMESTAMP '1999-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_qty_positive',
           CAST(SUM(CASE WHEN l_quantity <= 0 OR l_quantity IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders_totalprice_nonneg',
           CAST(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_fk',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    """,
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint suite (the Deequ/expectation
    pattern): primary-key uniqueness, value ranges, null guards, and
    foreign-key coverage, emitted as one (check_name, n_violations)
    frame a pipeline gates on before publishing a snapshot.

    Plan discipline — one scan per FACT table for ALL its checks: the
    FK probe rides a LEFT join on the same scan that feeds the
    aggregate (a miss is a NULL dim key, counted as one more
    conditional sum beside uniqueness/range/positivity), and the 1-row
    stats unpivot via stack() into (check_name, n_violations) rows.
    At 100 TB: lineitem is read once, orders twice (own checks + the
    one-column dim side of lineitem's FK), customer twice (own PK +
    the broadcast dim of orders' FK) — vs the naive
    one-query-per-check fan-out that re-reads the fact table seven
    times."""
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    cust_pk = cust.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("c_custkey"))).alias("v")
    ).select(
        F.lit("customer_pk_unique").alias("check_name"),
        F.col("v").cast("long").alias("n_violations"),
    )

    li_stats = (
        li.join(
            orders.select(F.col("o_orderkey").alias("_fk")),
            li.l_orderkey == F.col("_fk"),
            "left",
        )
        .agg(
            (
                F.count(F.lit(1))
                - F.count_distinct(
                    F.col("l_orderkey") * 10 + F.col("l_linenumber")
                )
            ).alias("pk"),
            F.sum(
                F.when(
                    (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp_ntz"))
                    | (
                        F.col("l_shipdate")
                        >= F.lit("1999-01-01").cast("timestamp_ntz")
                    ),
                    1,
                ).otherwise(0)
            ).alias("rng"),
            F.sum(
                F.when(
                    (F.col("l_quantity") <= 0) | F.col("l_quantity").isNull(), 1
                ).otherwise(0)
            ).alias("qty"),
            F.sum(F.when(F.col("_fk").isNull(), 1).otherwise(0)).alias("fk"),
        )
    )
    li_checks = li_stats.select(
        F.expr(
            "stack(4, 'lineitem_pk_unique', pk, "
            "'lineitem_shipdate_in_range', rng, "
            "'lineitem_qty_positive', qty, "
            "'lineitem_orderkey_fk', fk) AS (check_name, n_violations)"
        )
    ).select("check_name", F.col("n_violations").cast("long"))

    ord_stats = (
        orders.join(
            F.broadcast(cust.select(F.col("c_custkey").alias("_fk"))),
            orders.o_custkey == F.col("_fk"),
            "left",
        )
        .agg(
            F.sum(
                F.when(
                    (F.col("o_totalprice") < 0) | F.col("o_totalprice").isNull(), 1
                ).otherwise(0)
            ).alias("nonneg"),
            F.sum(F.when(F.col("_fk").isNull(), 1).otherwise(0)).alias("fk"),
        )
    )
    ord_checks = ord_stats.select(
        F.expr(
            "stack(2, 'orders_totalprice_nonneg', nonneg, "
            "'orders_custkey_fk', fk) AS (check_name, n_violations)"
        )
    ).select("check_name", F.col("n_violations").cast("long"))

    return cust_pk.unionByName(li_checks).unionByName(ord_checks)


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH s1 AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
      FROM events GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, s1.first_view,
             MIN(CASE WHEN e.event_type = 'purchase'
                       AND e.ts > s1.first_view THEN e.ts END)
               AS first_purchase
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      GROUP BY e.user_id, s1.first_view
    ), lat AS (
      SELECT CAST(date_diff('second', first_view, first_purchase)
               AS BIGINT) AS latency_s
      FROM s2
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(quantile_disc(latency_s, 0.5) AS BIGINT) AS p50_s,
           CAST(quantile_disc(latency_s, 0.9) AS BIGINT) AS p90_s,
           CAST(MIN(latency_s) AS BIGINT) AS min_s,
           CAST(MAX(latency_s) AS BIGINT) AS max_s
    FROM lat
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency distribution: first view → first
    purchase-AFTER-that-view per user, summarized as count + discrete
    p50/p90/min/max seconds — the business face of `funnel_steps`
    (how long does converting take, not just who converts).

    Plan: the same one-shuffle chained window-minima funnel reduces
    events to one (first_view, first_purchase) row per user; latencies
    are a user-sized frame and the summary is a single aggregate with
    exact discrete percentiles (group state = the user frame, bounded
    by user count — use agg_approx_percentile's sketch for billions of
    users). Integer seconds via timestamp diff: no float anywhere."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = ev.withColumn(
        "first_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    ).withColumn(
        "first_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("first_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    lat = (
        staged.groupBy("user_id")
        .agg(
            F.first("first_view").alias("fv"),
            F.first("first_purchase").alias("fp"),
        )
        .where(F.col("fv").isNotNull() & F.col("fp").isNotNull())
        .select(
            (F.unix_timestamp("fp") - F.unix_timestamp("fv"))
            .cast("long")
            .alias("latency_s")
        )
    )
    wg = "WITHIN GROUP (ORDER BY latency_s)"
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr(f"percentile_disc(0.5) {wg}").cast("long").alias("p50_s"),
        F.expr(f"percentile_disc(0.9) {wg}").cast("long").alias("p90_s"),
        F.min("latency_s").alias("min_s"),
        F.max("latency_s").alias("max_s"),
    )

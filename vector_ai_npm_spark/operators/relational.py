"""Relational operator suite (SURVEY.md §2B B3–B16).

Every query is a declarative DataFrame program — Catalyst owns predicate
pushdown, column pruning, and join-strategy selection; AQE owns runtime
coalescing and skew splitting. Each docstring notes the physical plan we
expect and why it survives a 100 TB scale-up.

Reference context: the reference (AnonJon/vector-ai-npm) delegates all
relational work to Postgres (vector-client.ts:402-404); this module is the
engine those delegated queries run on when the store is parquet at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.numeric import davg, dsum, o_davg, o_dsum
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

# --------------------------------------------------------------------------
# B3 — filter + projection (predicate pushdown / column pruning showcase)
# --------------------------------------------------------------------------


@query(
    "filter_project",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: TPC-H Q6-shaped scan.

    Plan: single parquet scan; all four predicates reach PushedFilters,
    ReadSchema is exactly the 6 referenced columns. No shuffle at any SF.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# B4 — broadcast equi-join (fact ⋈ small dim)
# --------------------------------------------------------------------------


@query(
    "join_broadcast",
    oracle=f"""
    SELECT p.p_brand,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 20
    GROUP BY p.p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: fact-to-dim join with an explicit broadcast hint.

    Plan: BroadcastHashJoin (dim `part` is KBs..GBs even at SF1e5) — the
    100-TB fact side never shuffles for the join; the only shuffle is the
    final partial→final hash aggregation on p_brand.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 20)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# B5 — multi-way shuffle join chain (planner-chosen SMJ/SHJ)
# --------------------------------------------------------------------------


@query(
    "join_sortmerge",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           {o_dsum('o.o_totalprice')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY r.r_name, n.n_name
    """,
)
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: orders ⋈ customer ⋈ nation ⋈ region revenue rollup.

    Plan: orders⋈customer is the one genuine shuffle join (both sides
    large at scale — SMJ/SHJ chosen by the planner + AQE); nation and
    region auto-broadcast under the 10MB threshold. Filter on
    o_orderstatus is pushed to the orders scan.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum("o_totalprice", "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# B6 — semi / anti joins
# --------------------------------------------------------------------------


@query(
    "join_semi_anti",
    oracle="""
    SELECT c_mktsegment, 'with_orders' AS cohort,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT c_mktsegment, 'without_orders' AS cohort,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: customers with orders (LEFT SEMI) vs without (LEFT ANTI).

    Plan: semi/anti hash joins never materialize the probe payload —
    orders contributes only its join key. At scale the orders side is
    pre-aggregated to distinct keys by the join itself (no explosion).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    cond = c.c_custkey == o.o_custkey
    semi = (
        c.join(o, cond, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select("c_mktsegment", F.lit("with_orders").alias("cohort"), "n_customers")
    )
    anti = (
        c.join(o, cond, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select("c_mktsegment", F.lit("without_orders").alias("cohort"), "n_customers")
    )
    return semi.unionByName(anti)


# --------------------------------------------------------------------------
# B7 — range (equi + interval) join
# --------------------------------------------------------------------------


@query(
    "join_range",
    oracle="""
    SELECT e.event_id AS error_event_id,
           CAST(COUNT(c.event_id) AS BIGINT) AS clicks_before
    FROM events e
    LEFT JOIN events c
      ON c.user_id = e.user_id
     AND c.event_type = 'click'
     AND c.ts >  e.ts - INTERVAL 30 MINUTE
     AND c.ts <= e.ts
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: per error event, clicks by the same user in the prior 30 min.

    Plan: the equi key (user_id) makes this a hash/SMJ join with the ts
    interval as a post-join predicate — NOT a nested-loop cross product.
    At 100 TB this shuffles both sides once on user_id; skewed users are
    split by AQE skew-join.
    """
    ev = load_table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    clk = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = err.join(
        clk,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("c_ts") > F.col("e_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("e_ts")),
        "left",
    )
    return joined.groupBy("error_event_id").agg(
        F.count("click_event_id").alias("clicks_before")
    )


# --------------------------------------------------------------------------
# B8 — as-of join (latest prior click per purchase)
# --------------------------------------------------------------------------


@query(
    "join_asof",
    oracle="""
    WITH purchases AS (
      SELECT * FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT * FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id AS purchase_event_id,
           p.user_id,
           c.event_id AS last_click_event_id
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: as-of join — for each purchase, the latest click at-or-before it.

    Spark has no native as-of join; the scalable formulation is the
    union-and-carry-forward trick: union both sides tagged, sort within
    each user_id partition by (ts, side), and carry the latest click's id
    forward with last(..., ignorenulls) over an unbounded-preceding
    window. ONE shuffle on user_id, no join explosion — compare the
    naive range-join+row_number which materializes every (purchase,
    earlier-click) pair before discarding all but one.

    Tie semantics: a click with ts == purchase ts counts (matches DuckDB
    ASOF `>=`); side ordering puts clicks before purchases at equal ts.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"),
        F.lit(0).alias("side"), F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("click_id"),
        F.lit(1).alias("side"), F.col("event_id").alias("purchase_id"),
    )
    unioned = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "click_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "last_click_event_id", F.last("click_id", ignorenulls=True).over(w)
    )
    return carried.where(F.col("side") == 1).select(
        F.col("purchase_id").alias("purchase_event_id"),
        "user_id",
        "last_click_event_id",
    )


# --------------------------------------------------------------------------
# B10 — hash aggregation (TPC-H Q1 shape)
# --------------------------------------------------------------------------


@query(
    "agg_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity')} AS sum_qty,
           {o_dsum('l_extendedprice')} AS sum_base_price,
           {o_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {o_davg('l_quantity')} AS avg_qty,
           {o_davg('l_extendedprice')} AS avg_price,
           {o_davg('l_discount')} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: TPC-H Q1-shaped pricing summary (the flagship relational agg).

    Plan: scan (shipdate filter pushed) → partial HashAggregate on every
    executor → single shuffle on the 2 grouping cols (≈6 groups) → final
    HashAggregate. Map-side combine means the shuffle carries ~6 rows per
    task regardless of input SF — this is exactly the shape that holds at
    100 TB. Decimal-path sums keep the value-hash stable vs the oracle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# B11 — exact distinct aggregation (+ approx variant, rows-only)
# --------------------------------------------------------------------------


@query(
    "agg_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11a: exact distinct users per event type.

    Plan: Spark expands count(distinct) into a two-phase aggregate
    (partial distinct on (event_type, user_id), then final count) — the
    shuffle carries deduplicated pairs, not raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11b: approx_count_distinct — the 100 TB path for high-cardinality
    keys (HyperLogLog++, no exact-distinct shuffle blowup).

    HLL sketch values are implementation-defined, so the raw estimate
    can't be oracle-compared — instead the CONTRACT is: the estimate must
    sit within ±2% of the exact count (rsd=0.02). The query emits the
    exact count plus the tolerance verdict as a boolean; the oracle
    asserts the same exact count and `approx_ok = TRUE`, making the
    accuracy guarantee itself the hash-checked value.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_approx"),
        F.countDistinct("user_id").alias("n_users_exact"),
    )
    tol = (
        F.abs(F.col("n_approx") - F.col("n_users_exact"))
        <= 0.02 * F.col("n_users_exact")
    )
    return agg.select("event_type", "n_users_exact", tol.alias("approx_ok"))


# --------------------------------------------------------------------------
# B12 — rollup / grouping sets
# --------------------------------------------------------------------------


@query(
    "agg_rollup",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS BIGINT) AS lvl,
           {o_dsum('c.c_acctbal')} AS total_acctbal,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: customer balance rollup region → nation → grand total.

    Plan: Spark expands rollup into an Expand node feeding one hash
    aggregate — still a single shuffle. grouping_id disambiguates NULL
    group keys from NULL data (same bitmask convention as DuckDB's
    GROUPING, high bit = first rollup column).
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("long").alias("lvl"),
            dsum("c_acctbal", "total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select("r_name", "n_name", "lvl", "total_acctbal", "n_customers")
    )


# --------------------------------------------------------------------------
# B13 — ranking window functions
# --------------------------------------------------------------------------


@query(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
             CAST(RANK() OVER w AS BIGINT) AS rnk,
             CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC)
    ) WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13: top-3 orders per customer with row_number/rank/dense_rank.

    Plan: one shuffle on o_custkey, in-partition sort. The rn<=3
    predicate triggers Spark's WindowGroupLimit pushdown — each task
    keeps only 3 rows per key before the full window evaluates.
    Deterministic tiebreak (o_orderkey) keeps the oracle hash stable.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# B14 — analytic window with running frame + lag/lead
# --------------------------------------------------------------------------


@query(
    "window_running",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER w
                AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE) AS running_spend,
           lag(o_orderkey) OVER w AS prev_orderkey,
           lead(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14: running spend per customer + lag/lead neighbors.

    Plan: single shuffle on o_custkey; cumulative frame is O(1) per row.
    The running sum uses the exact-decimal path so partial-order effects
    can't perturb low bits vs the oracle.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
        .over(wrun)
        .cast("decimal(38,8)")
        .cast("double")
        .alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


# --------------------------------------------------------------------------
# B15 — global top-k
# --------------------------------------------------------------------------


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15: global top-25 orders by price, deterministic tiebreak.

    Plan: TakeOrderedAndProject — each task keeps a 25-row heap, driver
    merges heaps. No global sort, no full shuffle; the classic top-k
    shape that is O(k) memory per task at any SF.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


# --------------------------------------------------------------------------
# B16 — set operations
# --------------------------------------------------------------------------


@query(
    "setops",
    oracle="""
    WITH building AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ), rich AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    SELECT 'union_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT * FROM building UNION ALL SELECT * FROM rich)
    UNION ALL
    SELECT 'intersect' AS op, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT * FROM building INTERSECT SELECT * FROM rich)
    UNION ALL
    SELECT 'except_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT * FROM building EXCEPT ALL SELECT * FROM rich)
    """,
)
def setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: union / intersect / exceptAll over two customer cohorts.

    Plan: union is metadata-only (no shuffle); intersect/exceptAll are
    hash-based distinct joins (one shuffle each on the full row key).
    """
    c = load_table(spark, sf_dir, "customer")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.where(F.col("c_acctbal") > 5000).select("c_custkey")

    def counted(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    return (
        counted("union_all", building.unionByName(rich))
        .unionByName(counted("intersect", building.intersect(rich)))
        .unionByName(counted("except_all", building.exceptAll(rich)))
    )


# --------------------------------------------------------------------------
# B12b — cube (full grouping-sets lattice)
# --------------------------------------------------------------------------


@query(
    "agg_cube",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           o_orderpriority,
           CAST(GROUPING(year(o_orderdate)) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS lvl,
           {o_dsum('o_totalprice')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CUBE (year(o_orderdate), o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12b: full cube over (year, priority) — all four grouping sets in
    one Expand + single-shuffle aggregate (same plan family as rollup;
    the Expand multiplies rows by #sets BEFORE the shuffle, so map-side
    combine still bounds shuffle volume by groups × sets)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            "o_orderpriority",
            "o_totalprice",
        )
        .cube("order_year", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("lvl"),
            dsum("o_totalprice", "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("order_year", "o_orderpriority", "lvl", "revenue", "n_orders")
    )


# --------------------------------------------------------------------------
# B1/B2 — named scan and sink operators
# --------------------------------------------------------------------------


@query(
    "scan_parquet",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: the named source operator — full-content scan of the smallest
    dimension tables (every other query exercises the same reader with
    pushdown; this one hash-checks raw scan fidelity end to end)."""
    from vector_ai_npm_spark.io.sources import load_table as lt

    n = lt(spark, sf_dir, "nation")
    r = lt(spark, sf_dir, "region")
    return n.join(r, n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@query(
    "sink_parquet",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {o_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY 1
    """,
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: partitioned parquet sink round-trip — write orders partitioned
    by order year (the partition-pruning layout for date-ranged reads at
    scale), re-read, and summarize per partition. The oracle checks the
    round-trip against the source table, proving the sink lost nothing.
    """
    import tempfile

    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    path = tempfile.mkdtemp(prefix="sink_parquet_") + "/orders"
    o.write.mode("overwrite").partitionBy("order_year").parquet(path)
    rt = spark.read.parquet(path)
    return rt.groupBy("order_year").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice", "total"),
    )


# --------------------------------------------------------------------------
# B4+/B5+ — scale patterns: salted skew join, bucketed co-located join
# --------------------------------------------------------------------------


@query(
    "join_skew_salted",
    oracle="""
    WITH clicks AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_user_clicks
      FROM events WHERE event_type = 'click' GROUP BY user_id
    )
    SELECT p.event_id, p.user_id,
           COALESCE(c.n_user_clicks, 0) AS n_user_clicks
    FROM events p LEFT JOIN clicks c ON p.user_id = c.user_id
    WHERE p.event_type = 'purchase'
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join via explicit salting: the fact side gets a
    deterministic salt (event_id % S); the dim side is exploded S× so
    every (key, salt) bucket exists. A hot user_id that would pin one
    reducer now spreads over S partitions. Results are IDENTICAL to the
    plain join (the oracle is the unsalted SQL) — salting is pure
    physical-plan medicine. AQE skew-join does this adaptively; the
    explicit form is for engines/joins AQE can't reach (e.g. left sides
    of stateful streaming joins) and for guaranteed layout control.
    """
    S = 8
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", (F.col("event_id") % S).alias("salt")
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_user_clicks"))
    )
    clicks_salted = clicks.select(
        "user_id", "n_user_clicks",
        F.explode(F.sequence(F.lit(0), F.lit(S - 1))).alias("salt"),
    ).withColumn("salt", F.col("salt").cast("long"))
    return (
        purchases.join(clicks_salted, ["user_id", "salt"], "left")
        .select(
            "event_id", "user_id",
            F.coalesce("n_user_clicks", F.lit(0)).cast("long")
            .alias("n_user_clicks"),
        )
    )


@query(
    "join_bucketed",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {o_dsum('l.l_extendedprice')} AS order_revenue,
           MIN(o.o_orderstatus) AS o_orderstatus
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 100000
    GROUP BY l.l_orderkey
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: persist both sides bucketed+sorted by
    the join key, then join WITHOUT any shuffle — the physical plan
    reads pre-bucketed files straight into a sort-merge join (verified
    by tests/test_plans.py: no Exchange above either scan).

    This is THE pattern for repeated 100 TB fact-fact joins: pay the
    shuffle once at layout time, never per query. Bucket counts must
    match (or divide) across tables; here 8/8.
    """
    import tempfile

    wh = tempfile.mkdtemp(prefix="bucket_wh_")
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{wh}'"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 100000
    ).select("o_orderkey", "o_orderstatus")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
       .sortBy("l_orderkey").saveAsTable("bucketdemo.li_b"))
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
       .sortBy("o_orderkey").saveAsTable("bucketdemo.o_b"))
    lb = spark.table("bucketdemo.li_b")
    ob = spark.table("bucketdemo.o_b")
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice", "order_revenue"),
            F.min("o_orderstatus").alias("o_orderstatus"),
        )
    )


@query(
    "scan_csv",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS DECIMAL(38,8))
                AS VARCHAR) AS DOUBLE) AS total_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1-csv: customer → CSV → read back with explicit schema → agg.
    The oracle runs on the original table, so the hash-match proves the
    text round-trip is lossless for ints/strings/doubles (doubles are
    written with full precision by Spark's CSV writer)."""
    from pyspark.sql import types as T

    from vector_ai_npm_spark.io.formats import csv_roundtrip

    c = load_table(spark, sf_dir, "customer")
    schema = T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ])
    rt = csv_roundtrip(c, schema)
    return rt.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal", "total_acctbal"),
    )


@query(
    "scan_json",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           min(source) AS first_source
    FROM documents
    GROUP BY lang
    """,
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1-json: documents → JSON lines → read back with explicit schema
    → agg; hash-matched against the original table."""
    from pyspark.sql import types as T

    from vector_ai_npm_spark.io.formats import json_roundtrip

    d = load_table(spark, sf_dir, "documents")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    rt = json_roundtrip(d, schema)
    return rt.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("source").alias("first_source"),
    )


# --------------------------------------------------------------------------
# Compound TPC-H-shaped queries (join depth + agg + top-k in one plan)
# --------------------------------------------------------------------------


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping-priority): selective dim filter →
    two-join chain → hash agg → top-10. Plan: customer filter broadcast
    into orders, orders⋈lineitem shuffles on orderkey, agg partial, then
    TakeOrderedAndProject for the limit."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1993-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier volume): five-way join with the
    classic same-nation theta condition folded into the supplier join.
    Region/nation/supplier broadcast; the only real shuffles are
    orders⋈customer and lineitem⋈orders on their keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1993-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --------------------------------------------------------------------------
# B10+ — reproducible second-moment statistics
# --------------------------------------------------------------------------


@query(
    "agg_stats",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             {o_dsum('l_quantity')} AS sx,
             {o_dsum('l_quantity * l_quantity')} AS sxx,
             {o_dsum('l_extendedprice')} AS sy,
             {o_dsum('l_extendedprice * l_extendedprice')} AS syy,
             {o_dsum('l_quantity * l_extendedprice')} AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           sx / n AS mean_qty,
           (sxx - sx * sx / n) / (n - 1) AS var_qty,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           (sxy - sx * sy / n) /
             (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_qty_price
    FROM s
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10+: mean / variance / stddev / correlation computed from EXACT
    decimal power sums, then finished in double arithmetic.

    Spark's built-in stddev/corr use streaming (Welford/co-moment)
    updates whose float error depends on partition order — re-running
    the same query on the same data can change low bits, and no SQL
    oracle can match them bit-for-bit. Power sums in exact decimal are
    order-independent, so the derived moments are bit-reproducible
    across engines AND across cluster layouts — worth knowing both
    options exist: built-ins for speed, this shape for auditable
    pipelines. (Textbook caveat: sum-of-squares cancellation — fine
    here because the sums are EXACT decimals, not floats.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", "sx"),
        dsum(F.col("l_quantity") * F.col("l_quantity"), "sxx"),
        dsum("l_extendedprice", "sy"),
        dsum(F.col("l_extendedprice") * F.col("l_extendedprice"), "syy"),
        dsum(F.col("l_quantity") * F.col("l_extendedprice"), "sxy"),
    )
    n = F.col("n").cast("double")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    corr = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (
        F.sqrt(F.col("sxx") - F.col("sx") * F.col("sx") / n)
        * F.sqrt(F.col("syy") - F.col("sy") * F.col("sy") / n)
    )
    return s.select(
        "l_returnflag",
        "n",
        (F.col("sx") / n).alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
        corr.alias("corr_qty_price"),
    )


# --------------------------------------------------------------------------
# B20+ — null semantics corner
# --------------------------------------------------------------------------


@query(
    "null_semantics",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS p,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderpriority END AS pri
      FROM orders
    )
    SELECT o_orderkey,
           COALESCE(p, -1.0) AS p_filled,
           NULLIF(pri, '1-URGENT') AS pri_nullif,
           (p IS NOT DISTINCT FROM NULL) AS p_is_null_safe,
           (p IS DISTINCT FROM p) AS never_true,
           CASE WHEN p IS NULL AND pri IS NULL THEN 'both'
                WHEN p IS NULL THEN 'price' WHEN pri IS NULL THEN 'priority'
                ELSE 'none' END AS null_shape
    FROM t
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20+: NULL-handling corner — coalesce, nullif, null-safe equality
    (<=> ↔ IS NOT DISTINCT FROM), three-valued CASE. These semantics are
    where engines classically diverge; the oracle pins ANSI behavior."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("p"),
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("pri"),
    )
    return t.select(
        "o_orderkey",
        F.coalesce("p", F.lit(-1.0)).alias("p_filled"),
        F.nullif(F.col("pri"), F.lit("1-URGENT")).alias("pri_nullif"),
        F.col("p").eqNullSafe(F.lit(None).cast("double")).alias("p_is_null_safe"),
        (~F.col("p").eqNullSafe(F.col("p"))).alias("never_true"),
        F.when(F.col("p").isNull() & F.col("pri").isNull(), "both")
        .when(F.col("p").isNull(), "price")
        .when(F.col("pri").isNull(), "priority")
        .otherwise("none")
        .alias("null_shape"),
    )


# --------------------------------------------------------------------------
# TPC-H Q7 / Q8 / Q21 shapes — nation-pair volume, market share,
# exists/not-exists correlated filters
# --------------------------------------------------------------------------


@query(
    "tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {o_dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1999-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between a nation pair).

    The nation-pair disjunction references BOTH sides of the join tree,
    so it cannot push below either nation join — but each branch's
    single-nation implication ("supp nation ∈ {3,7}") CAN, and Catalyst
    derives it via constraint propagation, shrinking supplier/customer
    before the big joins. nation (25 rows) broadcasts twice; supplier
    broadcasts; the only at-scale shuffles are lineitem⋈orders and
    orders⋈customer on their natural keys."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    pair = (
        (F.col("n1.n_name") == "NATION_3") & (F.col("n2.n_name") == "NATION_7")
    ) | ((F.col("n1.n_name") == "NATION_7") & (F.col("n2.n_name") == "NATION_3"))
    return (
        F.broadcast(s)
        .join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2.n_nationkey"))
        .where(pair)
        .select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume", "revenue"))
    )


@query(
    "tpch_q8",
    oracle=f"""
    SELECT o_year,
           {o_dsum("CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END")}
             / {o_dsum('volume')} AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): seven-way join, then a
    conditional-sum ratio per year.

    Both numerator and denominator are computed in ONE aggregation pass
    (conditional decimal sum), not two scans — the classic
    sum(CASE)/sum trick. part filter prunes lineitem early via the
    p_partkey join (broadcast at these SFs; bucketed/shuffle at 100 TB);
    region/nation broadcast always."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        F.broadcast(p)
        .join(li, p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
        .groupBy("o_year")
        .agg(
            (
                dsum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(0.0))
                / dsum("volume")
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q21",
    oracle="""
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lo l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM lo l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lo l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    EXISTS + NOT-EXISTS correlated pair, expressed as left-semi + left-anti
    joins on the same derived relation.

    The fixtures lack l_commitdate/l_receiptdate, so "late" is
    l_shipdate > o_orderdate + 90 days — same plan topology as the real
    Q21 (self-semi/anti on lineitem by orderkey with a suppkey
    inequality), different lateness predicate.

    Scale notes: `lo` is computed ONCE and reused for all three roles —
    Spark dedups the scan via plan reuse. Both the semi and anti joins
    shuffle on l_orderkey only (the suppkey inequality rides along as a
    join residual, never a cartesian). At 100 TB this is 3 shuffles of
    the filtered fact table, no broadcast risk."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias(
            "late"
        ),
    )
    l1 = lo.where(F.col("late"))
    l2 = lo.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = lo.where(F.col("late")).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# B10+ — exact and approximate quantile families
# --------------------------------------------------------------------------


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.5)  AS p50,
           quantile_disc(l_extendedprice, 0.9)  AS p90,
           quantile_disc(l_extendedprice, 0.99) AS p99,
           quantile_cont(l_extendedprice, 0.5)  AS p50_cont,
           median(l_extendedprice)              AS med
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10+: exact per-group quantiles — discrete (an actual data value,
    bit-exact across engines by construction) and continuous (linear
    interpolation; Spark's and DuckDB's formulas agree bit-for-bit on
    this data, pinned by the parity sweep at sf0.01 AND sf0.1).

    Scale note: exact percentile is a sort-based aggregate — per-group
    state is the full value multiset, so memory is O(group size). Fine
    for bounded groups (3 flags here); for billion-row groups reach for
    `agg_approx_percentile` (GK sketch, bounded state, mergeable
    map-side) and accept the documented error bound instead."""
    li = load_table(spark, sf_dir, "lineitem")
    wg = "WITHIN GROUP (ORDER BY l_extendedprice)"
    return li.groupBy("l_returnflag").agg(
        F.expr(f"percentile_disc(0.5) {wg}").alias("p50"),
        F.expr(f"percentile_disc(0.9) {wg}").alias("p90"),
        F.expr(f"percentile_disc(0.99) {wg}").alias("p99"),
        F.expr(f"percentile_cont(0.5) {wg}").alias("p50_cont"),
        F.median("l_extendedprice").alias("med"),
    )


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.5)  AS exact_p50,
           TRUE AS p50_ok,
           quantile_disc(l_extendedprice, 0.9)  AS exact_p90,
           TRUE AS p90_ok,
           quantile_disc(l_extendedprice, 0.99) AS exact_p99,
           TRUE AS p99_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10+ scale path: approx_percentile (Greenwald-Khanna sketch,
    accuracy 10000 → rank error ≤ ε = 1/10000). Sketches merge
    associatively, so the plan is a normal partial aggregate — bounded
    memory regardless of group size, single shuffle.

    The raw sketch values differ across engines, so the driver-checkable
    face pins the CONTRACT instead of the bits: emit the exact discrete
    quantiles (bit-stable — actual data values) beside a boolean per
    rank asserting the approx value lies inside the rank-error band
    [percentile_disc(q-5ε), percentile_disc(q+5ε)].  The oracle mirrors
    the exact side in DuckDB (quantile_disc) and TRUE per band — any
    drift of the approx path outside its guarantee hash-mismatches into
    a red driver row.  The 5ε margin (0.05 % of rank space, vs GK's ε
    guarantee) absorbs disc's ceil-rank rounding and value ties without
    weakening the check materially.  tests/test_percentiles.py pins the
    same bound locally at a tighter 2ε."""
    li = load_table(spark, sf_dir, "lineitem")
    eps = 1.0 / 10000.0
    wg = "WITHIN GROUP (ORDER BY l_extendedprice)"
    ranks = [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
    aggs = [
        F.percentile_approx("l_extendedprice", [q for q, _ in ranks], 10000).alias(
            "qs"
        )
    ]
    for q, nm in ranks:
        lo, hi = max(0.0, q - 5 * eps), min(1.0, q + 5 * eps)
        aggs += [
            F.expr(f"percentile_disc({q}) {wg}").alias(f"exact_{nm}"),
            F.expr(f"percentile_disc({lo}) {wg}").alias(f"_lo_{nm}"),
            F.expr(f"percentile_disc({hi}) {wg}").alias(f"_hi_{nm}"),
        ]
    sk = li.groupBy("l_returnflag").agg(*aggs)
    cols = ["l_returnflag"]
    for i, (_q, nm) in enumerate(ranks, start=1):
        a = F.element_at("qs", i)
        cols += [
            F.col(f"exact_{nm}"),
            ((F.col(f"_lo_{nm}") <= a) & (a <= F.col(f"_hi_{nm}"))).alias(
                f"{nm}_ok"
            ),
        ]
    return sk.select(*cols)


# --------------------------------------------------------------------------
# B13+ — analytic window breadth (ntile / percent_rank / cume_dist /
# first / last / nth)
# --------------------------------------------------------------------------


@query(
    "window_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           FIRST_VALUE(o_orderkey) OVER wf AS cheapest_order,
           LAST_VALUE(o_orderkey) OVER wf AS priciest_order,
           NTH_VALUE(o_orderkey, 2) OVER wf AS second_order
    FROM orders
    WINDOW w  AS (PARTITION BY o_custkey
                  ORDER BY o_totalprice ASC, o_orderkey ASC),
           wf AS (PARTITION BY o_custkey
                  ORDER BY o_totalprice ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13+: distribution analytics per customer. percent_rank/cume_dist
    are rank ratios (exact rationals in double — engine-stable);
    first/last/nth use the full-partition frame so LAST_VALUE means the
    partition max, not the running row. One shuffle on o_custkey serves
    every function (same window spec → single Window node)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(wf).alias("cheapest_order"),
        F.last("o_orderkey").over(wf).alias("priciest_order"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_order"),
    )


# --------------------------------------------------------------------------
# B12+ — explicit GROUPING SETS (the general lattice rollup/cube special-case)
# --------------------------------------------------------------------------


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           o_orderpriority,
           CAST(GROUPING(EXTRACT(year FROM o_orderdate)) * 2
                + GROUPING(o_orderpriority) AS BIGINT) AS lvl,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {o_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY GROUPING SETS (
      (EXTRACT(year FROM o_orderdate), o_orderpriority),
      (EXTRACT(year FROM o_orderdate)),
      (o_orderpriority)
    )
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12+: an explicit grouping-sets lattice that neither rollup nor
    cube expresses — (year,prio), (year), (prio) but NOT the grand
    total. SQL-API face (GROUPING SETS has no DataFrame builder);
    physically identical to rollup: one Expand node multiplying rows by
    3, then a single hash aggregate + one shuffle."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT year(o_orderdate) AS o_year,
               o_orderpriority,
               CAST(grouping(year(o_orderdate)) * 2
                    + grouping(o_orderpriority) AS BIGINT) AS lvl,
               count(1) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8)))
                    AS DECIMAL(30,8)) AS DOUBLE) AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS (
          (year(o_orderdate), o_orderpriority),
          (year(o_orderdate)),
          (o_orderpriority)
        )
        """
    )


# --------------------------------------------------------------------------
# B12++ — pivot / unpivot (wide↔long reshaping)
# --------------------------------------------------------------------------


@query(
    "pivot_orders",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS urgent_n,
           CAST(COUNT(*) FILTER (o_orderpriority = '2-HIGH')   AS BIGINT) AS high_n,
           CAST(COUNT(*) FILTER (o_orderpriority = '5-LOW')    AS BIGINT) AS low_n,
           {o_dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END")} AS urgent_total,
           {o_dsum("CASE WHEN o_orderpriority = '2-HIGH'   THEN o_totalprice END")} AS high_total,
           {o_dsum("CASE WHEN o_orderpriority = '5-LOW'    THEN o_totalprice END")} AS low_total
    FROM orders
    GROUP BY 1
    """,
)
def pivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12++: long→wide pivot on order priority with an EXPLICIT value
    list. Explicit values matter at scale: without them Spark runs an
    extra distinct-values job over the whole input just to learn the
    output schema. With them, the pivot compiles to one pass of
    conditional aggregates (exactly the oracle's FILTER form) — single
    shuffle on the grouping key."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy(F.year("o_orderdate").alias("o_year"))
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "5-LOW"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("decimal(30,8)")
            .cast("double")
            .alias("total"),
        )
    )
    return piv.select(
        "o_year",
        F.col("`1-URGENT_n`").alias("urgent_n"),
        F.col("`2-HIGH_n`").alias("high_n"),
        F.col("`5-LOW_n`").alias("low_n"),
        F.col("`1-URGENT_total`").alias("urgent_total"),
        F.col("`2-HIGH_total`").alias("high_total"),
        F.col("`5-LOW_total`").alias("low_total"),
    )


@query(
    "unpivot_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
    FROM lineitem WHERE l_quantity IS NOT NULL
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
    FROM lineitem WHERE l_extendedprice IS NOT NULL
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_discount IS NOT NULL
    """,
)
def unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12++: wide→long melt of three measures via DataFrame.unpivot
    (Expand node: 3 output rows per input row in one pass — NOT three
    scans unioned; the oracle's UNION ALL is just the portable spelling,
    including unpivot's drop-NULL-values semantics)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    ).withColumn(
        "measure",
        F.when(F.col("measure") == "l_quantity", "quantity")
        .when(F.col("measure") == "l_extendedprice", "price")
        .otherwise("discount"),
    )


@query(
    "scan_orc",
    oracle=f"""
    SELECT p_brand, p_type,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           {o_dsum('p_retailprice')} AS total_price,
           CAST(MAX(p_size) AS INTEGER) AS max_size
    FROM part
    WHERE p_size >= 10
    GROUP BY p_brand, p_type
    """,
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1-orc: part → ORC → read back → filtered agg, hash-matched
    against the original parquet table (typed columnar round-trip is
    exact by construction; the point is the source plumbing). The
    p_size filter pushes into the ORC scan just like parquet —
    tests/test_plans.py pins PushedFilters on the ORC relation."""
    from vector_ai_npm_spark.io.formats import orc_roundtrip

    p = load_table(spark, sf_dir, "part")
    rt = orc_roundtrip(p)
    return (
        rt.where(F.col("p_size") >= 10)
        .groupBy("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice", "total_price"),
            F.max("p_size").alias("max_size"),
        )
    )


@query(
    "agg_percentile_dist",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.5)  AS p50,
           quantile_disc(l_extendedprice, 0.9)  AS p90,
           quantile_disc(l_extendedprice, 0.99) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10+ distributed exact quantiles — same answer as
    `agg_percentile`'s percentile_disc, different plan for the
    low-cardinality-group trap: the built-in is a sort aggregate whose
    per-group state is the FULL value multiset, so 3 groups = 3 tasks
    own all the data (3.5 s at sf0.1 vs ~1 s here; unbounded memory per
    task at 100 TB).

    Scalable shape: (1) groupBy (group, value) count — fully parallel,
    combines map-side, shrinks data to distinct values; (2) cumulative
    count over values within group — a window over the SMALL distinct
    set; (3) the p-quantile is the smallest value whose cumulative
    count reaches ceil(p·n), compared in integer arithmetic
    (cum·10000 ≥ p₁₀₀₀₀·n) so float rounding can't shift the boundary.
    percentile_disc semantics: smallest v with cume_dist(v) ≥ p."""
    li = load_table(spark, sf_dir, "lineitem")
    vc = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vc.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("l_returnflag"))
    )

    def q(p10000: int, alias: str):
        return F.min(
            F.when(
                F.col("cum") * 10000 >= F.lit(p10000) * F.col("n"),
                F.col("l_extendedprice"),
            )
        ).alias(alias)

    return cum.groupBy("l_returnflag").agg(
        q(5000, "p50"), q(9000, "p90"), q(9900, "p99")
    )


# --------------------------------------------------------------------------
# B10++ — collection aggregates, map functions, TPC-H Q13/Q18 shapes,
# sampling
# --------------------------------------------------------------------------


@query(
    "agg_collect",
    oracle="""
    SELECT o_custkey,
           array_to_string(list(o_orderkey ORDER BY o_orderkey), ',')
             AS orderkeys,
           array_to_string(list(DISTINCT o_orderpriority
                                ORDER BY o_orderpriority), ',')
             AS priorities,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10++: collection aggregates. collect_list is order-NONdeterministic
    under parallelism, so both engines sort: sort_array(collect_list)
    ⇔ list(... ORDER BY ...). The sorted lists are then serialized to
    CSV strings — numerically sorted BEFORE the string cast, matching
    DuckDB's array_to_string(list(... ORDER BY ...)) — because
    array-typed output columns crash the driver's pandas canonicalizer
    (round-1 red row). Scale note: per-group state is the whole list —
    same group-size caveat as exact percentiles; bound group cardinality
    or cap with slice when lists can explode."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("o_orderkey")),
                lambda c: c.cast("string"),
            ),
            ",",
        ).alias("orderkeys"),
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "map_funcs",
    oracle="""
    WITH per_flag AS (
      SELECT l_orderkey, l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_orderkey, l_returnflag
    )
    SELECT l_orderkey, l_returnflag AS flag_key, cnt AS flag_count,
           cnt * 2 AS doubled
    FROM per_flag
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20+ (maps): build a MAP column (map_from_entries of per-key
    counts), transform its values (transform_values), then explode back
    to rows. The map NEVER reaches the output schema — cross-engine map
    hashing is representation-dependent, so the contract is checked on
    the exploded entries (which also proves keys/values round-trip).
    Plan: one shuffle for the pair-count, map ops are per-row JVM
    expressions, explode is a Generate node."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.groupBy("l_orderkey", "l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mapped = pairs.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("l_returnflag", "cnt")))
        ).alias("flag_counts")
    )
    doubled = mapped.withColumn(
        "doubled_map",
        F.transform_values("flag_counts", lambda _, v: v * 2),
    )
    return doubled.select(
        "l_orderkey",
        F.explode("flag_counts").alias("flag_key", "flag_count"),
        "doubled_map",
    ).select(
        "l_orderkey",
        "flag_key",
        "flag_count",
        F.col("doubled_map")[F.col("flag_key")].alias("doubled"),
    )


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    join with a predicate ON THE JOIN (not a post-filter — customers
    with only urgent orders must still appear with count 0), count of a
    NULLABLE column (nulls don't count), then a second tiny aggregation.

    Scale: one shuffle for the join (customer⋈orders on custkey), one
    for each agg; the second agg's key space is ~max orders per
    customer (tiny). No broadcast — both sides are fact-sized at 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q18",
    oracle=f"""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
           {o_dsum('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(30,8))) > 150
    )
    GROUP BY c.c_custkey, o.o_orderkey, o.o_totalprice
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): IN-subquery-with-HAVING
    expressed as an aggregate → left-semi join. The decimal threshold
    comparison is exact on both engines (no float boundary flap).

    Scale: the HAVING aggregate and the main join both shuffle lineitem
    on l_orderkey — AQE reuses the exchange where possible; the semi
    join output (few keys) broadcasts back onto orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,8)")).alias("q"))
        .where(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(big, o.o_orderkey == big.big_orderkey, "left_semi")
        .join(c, c.c_custkey == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(dsum("l_quantity", "total_qty"))
    )


@query(
    "sample_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || '#' ||
               CAST(l_linenumber AS VARCHAR)), 1, 15) AS BIGINT) % 1000 < 100
    """,
)
def sample_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3+: deterministic HASH-THRESHOLD sample — md5(key) % 1000 < 100
    selects a reproducible ~10% of rows, identically in any engine.

    Why hash-threshold over `df.sample(seed=...)`: Bernoulli sampling is
    only deterministic for a FIXED partitioning (the RNG stream is
    per-partition), so a repartitioned 100 TB table silently yields a
    different sample, and no cross-engine oracle exists. Keyed hashing is
    partitioning-independent, stable across engines/runs, and composable
    (the same predicate re-selects the same rows downstream). Still a
    scan-level per-row filter — no shuffle; for split-pruning sampling
    use TABLESAMPLE (x PERCENT)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.md5(
        F.concat_ws("#", F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"))
    )
    bucket = F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint") % 1000
    return li.where(bucket < 100).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# --------------------------------------------------------------------------
# TPC-H Q4 / Q10 / Q14 / Q16 / Q19 / Q22 shapes (fixture-schema adapted:
# no commitdate/receiptdate/shipmode/phone/partsupp — predicates translated,
# topology preserved)
# --------------------------------------------------------------------------


@query(
    "tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (priority order check): correlated EXISTS with a
    cross-relation predicate (lineitem date vs ORDER date), so the
    lateness test must ride INSIDE the semi-join condition — it can't
    pre-filter either side alone. One shuffle on orderkey."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): revenue lost to
    returns per customer, top 20. Plan: returnflag filter pushes into
    the lineitem scan; orders date filter into its scan; two key
    shuffles + broadcast nation; TakeOrderedAndProject caps the
    result."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "tpch_q14",
    oracle=f"""
    SELECT 100.00 * {o_dsum("CASE WHEN p.p_type = 'PROMO' "
                            "THEN l.l_extendedprice * (1 - l.l_discount) "
                            "ELSE 0 END")}
           / {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): global conditional-sum ratio
    — numerator and denominator in ONE aggregation pass over a
    month-pruned scan; part broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / dsum(rev)
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): NOT IN subquery as
    a left-anti join (the excluded set has no NULLs, so anti ≡ NOT IN),
    then COUNT DISTINCT per group — Spark expands distinct aggregation
    to a two-level aggregate; still one data shuffle + one agg
    shuffle."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "tpch_q19",
    oracle=f"""
    SELECT {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    the OR-of-ANDs references both sides, so it evaluates as a join
    residual; Catalyst still derives the single-side implications
    (brand ∈ {1,2,3}, size ≤ 35, quantity ≤ 30) and pushes THOSE into
    the scans — the classic Q19 optimizer test."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.where(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


@query(
    "tpch_q22",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(CAST(c_acctbal AS DECIMAL(30,8))) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS cntry, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,8)))
                AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND CAST(c.c_acctbal AS DECIMAL(30,8)) > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): scalar AVG subquery
    (broadcast single row), above-average filter IN EXACT DECIMAL (a
    float avg boundary would flap between engines), anti join against
    URGENT orders (every fixture customer has SOME order, so the classic
    never-ordered predicate is rewritten to never-ordered-urgently — same
    anti-join topology). Nation-key buckets stand in for the
    fixture-less phone country codes."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    avg_bal = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0.0)
        .agg(F.avg(F.col("c_acctbal").cast("decimal(30,8)")).alias("a"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal").cast("decimal(30,8)") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(30,8)"))
            .cast("decimal(38,8)")
            .cast("double")
            .alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# B4+ — full outer join; B1+ — corrupt-record tolerant CSV ingest
# --------------------------------------------------------------------------


@query(
    "join_full_outer",
    oracle=f"""
    WITH hi_cust AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 7500
    ),
    big_orders AS (
      SELECT o_custkey, {o_dsum('o_totalprice')} AS spend,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders WHERE o_totalprice > 200000 GROUP BY o_custkey
    )
    SELECT COALESCE(h.c_custkey, b.o_custkey) AS custkey,
           h.c_acctbal, b.spend, b.n_orders,
           (h.c_custkey IS NULL) AS only_orders,
           (b.o_custkey IS NULL) AS only_balance
    FROM hi_cust h FULL OUTER JOIN big_orders b
      ON h.c_custkey = b.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4+: FULL OUTER join of two partially-overlapping cohorts —
    null-extension on BOTH sides, the one join type where neither side
    can be pruned or broadcast (a broadcast full-outer cannot produce
    the build side's unmatched rows; Spark correctly refuses, so the
    plan is a sort-merge with both sides shuffled — at any scale)."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_acctbal") > 7500
    ).select("c_custkey", "c_acctbal")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 200000)
        .groupBy("o_custkey")
        .agg(dsum("o_totalprice", "spend"), F.count(F.lit(1)).alias("n_orders"))
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_acctbal",
        "spend",
        "n_orders",
        F.col("c_custkey").isNull().alias("only_orders"),
        F.col("o_custkey").isNull().alias("only_balance"),
    )


@query(
    "scan_csv_corrupt",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, CAST(2 AS BIGINT) AS n_corrupt
    FROM customer
    """,
)
def scan_csv_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1+: tolerant ingest — a CSV drop with malformed rows read in
    PERMISSIVE mode with a _corrupt_record capture column: bad rows
    become DATA (quarantine-able), not job failures. The 100 TB rule
    this encodes: a million-file ingest must never die on row 3 of file
    812,007; tests/test_percentiles.py pins good/bad row routing.

    Oracle face: the CLEAN subset must round-trip exactly (= the source
    customer table), and the quarantine count (2 planted bad rows) rides
    along as a constant column — so both halves of the PERMISSIVE
    contract are hash-checked. c_acctbal stays out of the face: the CSV
    hop stringifies it with Spark's double→string formatting, which has
    no DuckDB twin."""
    import tempfile

    from pyspark.sql import types as T

    c = load_table(spark, sf_dir, "customer")
    path = tempfile.mkdtemp(prefix="csv_corrupt_") + "/data"
    good = c.select(
        F.concat_ws(
            ",",
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.col("c_acctbal").cast("string"),
        ).alias("line")
    )
    # plant malformed rows: truncated fields and a non-numeric key
    bad = spark.createDataFrame(
        [("9999990,BROKEN",), ("notanint,Bad Row,xx,zz",)], ["line"]
    )
    good.unionByName(bad).coalesce(4).write.mode("overwrite").text(path)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    # Spark refuses predicates that touch ONLY _corrupt_record on a raw
    # CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); persist the parsed
    # batch first — which is the real quarantine pattern anyway (parse
    # once, then split clean/bad from the materialized result).
    parsed_path = tempfile.mkdtemp(prefix="csv_parsed_") + "/parsed"
    raw.write.mode("overwrite").parquet(parsed_path)
    raw = spark.read.parquet(parsed_path)
    n_corrupt = raw.where(F.col("_corrupt_record").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_corrupt")
    )
    clean = raw.where(F.col("_corrupt_record").isNull()).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    return clean.crossJoin(F.broadcast(n_corrupt))


@query(
    "pandas_api_bridge",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def pandas_api_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-interop: the pandas-on-Spark API (`pyspark.pandas`) running the
    same distributed plan — a pandas-shaped groupby/agg lowers to the
    identical Exchange+HashAggregate a DataFrame groupBy produces, so
    pandas-skilled users get cluster scale without the pandas
    single-node ceiling. Integer aggregates only (ps float sums don't
    go through our exact-decimal path). `.to_spark()` returns to the
    engine's native currency."""
    import pyspark.pandas as ps

    psdf = ps.DataFrame(
        load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_custkey")
    )
    agg = psdf.groupby("c_mktsegment").agg({"c_custkey": ["count", "min", "max"]})
    agg.columns = ["n", "min_key", "max_key"]
    out = agg.reset_index().to_spark()
    return out.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n"),
        F.col("min_key").cast("long").alias("min_key"),
        F.col("max_key").cast("long").alias("max_key"),
    )


@query(
    "window_range_trailing",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(COUNT(*) OVER w AS BIGINT) AS trailing_n,
           CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER w
                AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE) AS trailing_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14+: 30-day TRAILING window per customer — a RANGE frame over
    event time (every order sees the orders of its preceding 30 days,
    however many rows that is), vs B14's ROWS frame which counts rows.
    Time ordering is epoch SECONDS on both engines so the frame bound
    is integer arithmetic; RANGE includes timestamp peers, making ties
    deterministic without a tiebreak column. One shuffle on o_custkey;
    the frame is a sliding accumulator, O(1) amortized per row."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.count(F.lit(1)).over(w).cast("long").alias("trailing_n"),
        F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
        .over(w)
        .cast("decimal(38,8)")
        .cast("double")
        .alias("trailing_spend"),
    )


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT scope, ok FROM (VALUES
      ('columns_unioned', TRUE), ('rows_preserved', TRUE),
      ('old_files_null_extended', TRUE), ('new_files_null_extended', TRUE),
      ('overlap_values_preserved', TRUE)
    ) t(scope, ok)
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1+: schema-evolution read — a table whose older files lack a
    column the newer files added (and vice versa), scanned as ONE
    relation with ``mergeSchema``, as oracle-pinnable booleans.

    The fixture writes two generations from a deterministic split of
    orders: v1 carries (o_orderkey, o_custkey, o_totalprice), v2
    swapped o_custkey for o_orderpriority. The merged scan must union
    the schemas, null-extend each generation's missing column, keep
    every row, and preserve the overlapping column's values bit-exactly
    (xor-fold checksum vs the source split).

    Scale note: mergeSchema=true makes the DRIVER read every file
    footer at planning time — fine per partition-directory, pathological
    across millions of files; production tables put the evolving schema
    in a catalog (Delta/Iceberg) and Spark reads footers only for
    pruned files. The null-extension semantics this pins are identical
    either way."""
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="schema_evo_")
    v1_src = orders.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    v2_src = orders.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    v1_src.write.mode("overwrite").parquet(f"{base}/g=1")
    v2_src.write.mode("overwrite").parquet(f"{base}/g=2")

    merged = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", base)
        .parquet(f"{base}/g=1", f"{base}/g=2")
    )
    cols_ok = {
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    } <= set(merged.columns)

    def _sig(df: DataFrame):
        row = df.select(
            F.xxhash64("o_orderkey", "o_totalprice").alias("h")
        ).agg(
            F.expr("bit_xor(h)").alias("sig"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        return row.sig, row.n

    sig_src = _sig(v1_src.select("o_orderkey", "o_totalprice").unionByName(
        v2_src.select("o_orderkey", "o_totalprice")
    ))
    sig_merged = _sig(merged)
    stats = merged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                (F.col("o_orderkey") % 2 == 0)
                & F.col("o_orderpriority").isNull(), 1
            ).otherwise(0)
        ).alias("old_nulls"),
        F.sum(F.when(F.col("o_orderkey") % 2 == 0, 1).otherwise(0)).alias("n_old"),
        F.sum(
            F.when(
                (F.col("o_orderkey") % 2 == 1) & F.col("o_custkey").isNull(), 1
            ).otherwise(0)
        ).alias("new_nulls"),
        F.sum(F.when(F.col("o_orderkey") % 2 == 1, 1).otherwise(0)).alias("n_new"),
    ).collect()[0]

    rows = [
        ("columns_unioned", bool(cols_ok)),
        ("rows_preserved", sig_merged[1] == sig_src[1]),
        ("old_files_null_extended", stats.old_nulls == stats.n_old),
        ("new_files_null_extended", stats.new_nulls == stats.n_new),
        ("overlap_values_preserved", sig_merged[0] == sig_src[0]),
    ]
    return spark.createDataFrame(rows, "scope string, ok boolean")


@query(
    "join_asof_nearest",
    oracle="""
    WITH purchases AS (
      SELECT * FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT * FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT p.event_id AS pid, p.user_id, p.ts AS pts,
             c.event_id AS bid, c.ts AS bts
      FROM purchases p
      ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    f AS (
      SELECT p.event_id AS pid, c.event_id AS fid, c.ts AS fts
      FROM purchases p
      ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts < c.ts
    )
    SELECT b.pid AS purchase_event_id, b.user_id,
           CASE WHEN b.bid IS NULL THEN f.fid
                WHEN f.fid IS NULL THEN b.bid
                WHEN epoch_us(b.pts) - epoch_us(b.bts)
                     <= epoch_us(f.fts) - epoch_us(b.pts) THEN b.bid
                ELSE f.fid END AS nearest_click_event_id,
           CASE WHEN b.bid IS NULL AND f.fid IS NULL THEN NULL
                WHEN b.bid IS NULL THEN 'forward'
                WHEN f.fid IS NULL THEN 'backward'
                WHEN epoch_us(b.pts) - epoch_us(b.bts)
                     <= epoch_us(f.fts) - epoch_us(b.pts) THEN 'backward'
                ELSE 'forward' END AS direction
    FROM b JOIN f ON f.pid = b.pid
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8': NEAREST-direction as-of — for each purchase, the click
    closest in time in EITHER direction (ties to the backward match),
    the sensor-alignment variant of the backward-only `join_asof`.

    Same single-shuffle union-and-carry shape, twice: the tagged union
    sorts once per user and TWO frames over that one sort produce the
    backward candidate (last click at-or-before, unbounded-preceding
    frame) and the forward candidate (first click strictly-after,
    current-to-following frame) — Catalyst plans both window functions
    over the SAME Sort+Exchange, so nearest costs exactly what
    backward-only costs: one shuffle, no range-join explosion. The
    oracle mirrors it as two DuckDB ASOF joins (>= and <) merged on
    the purchase key; distances compare in integer microseconds."""
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
    order = [F.col("ts"), F.col("side"), F.col("click.cid")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.withColumn(
        "back", F.last("click", ignorenulls=True).over(wb)
    ).withColumn("fwd", F.first("click", ignorenulls=True).over(wf))
    p = carried.where(F.col("side") == 1)
    # ntz − ntz yields a day-time interval; interval comparison is exact
    # microsecond arithmetic (unix_micros would require a tz cast)
    dback = F.col("ts") - F.col("back.cts")
    dfwd = F.col("fwd.cts") - F.col("ts")
    back_wins = F.col("fwd").isNull() | (
        F.col("back").isNotNull() & (dback <= dfwd)
    )
    return p.select(
        F.col("purchase_id").alias("purchase_event_id"),
        "user_id",
        F.when(back_wins, F.col("back.cid"))
        .otherwise(F.col("fwd.cid"))
        .alias("nearest_click_event_id"),
        F.when(F.col("back").isNull() & F.col("fwd").isNull(), F.lit(None))
        .when(back_wins, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )

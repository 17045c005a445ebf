"""Experimentation + robust-cleaning operators (wave 3).

* `ab_test_summary` — the product-experimentation readout: users are
  deterministically bucketed into two arms (seedless md5 of user_id —
  the same engine-stable assignment rule real experiment platforms use
  so a user never flips arms), and each arm reports exposure, converter
  counts, purchase totals, exact-decimal revenue, and the conversion
  rate.  The
  statistical decision (z/χ² p-value) needs erf/ln — engine-divergent
  libm — so the face reports the exact sufficient statistics instead;
  any downstream tool computes p from them bit-freely.
* `curate_winsorize` — robust outlier clamping: per-event_type p01/p99
  (exact ``percentile_disc``) pulled back as a tiny broadcast stats
  frame, values clamped into [p01, p99] — the standard winsorization
  pass before training on heavy-tailed telemetry.  Same two-pass shape
  as `anomaly_mad` (grouped percentile pass over the fact, stats-sized
  join back), one fact shuffle total.

* `drift_ks_arms` — the two-sample Kolmogorov-Smirnov statistic between
  the arms' purchase-value distributions (the outcome-distribution
  check experiment platforms run next to the mean readout: a shifted
  spend distribution with an unchanged mean is exactly what KS sees and
  a t-test misses).  The statistic D = max|F_a(x) − F_b(x)| is computed
  EXACTLY in integers: per distinct value the cross-product
  |cum_a·n_b − cum_b·n_a| avoids any division until the final
  correctly-rounded DOUBLE cast, so both engines agree bit-for-bit (no
  erf/ln anywhere — the drift_token_chisq decision applied to KS).

Scale: arm aggregation is 2 rows of state; winsorize stats are
|event_type| rows broadcast back over the scan.  The KS cumulatives use
the concurrency_sweep two-level prefix-sum shape — running sums WITHIN
floor(value) buckets in parallel, a tiny per-bucket carry frame with its
own prefix sum, broadcast back — so there is no global single-partition
sort at any corpus size; cross-products ride DECIMAL(38,0) so n_a·n_b
never overflows int64 even at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.numeric import dsum, o_dsum
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

# md5-derived arm assignment (cross-engine hash idiom, text/curation.py)
_SPARK_ARM = (
    "CASE WHEN pmod(CAST(conv(substring(md5(CAST(user_id AS STRING) || "
    "'#ab1'), 1, 8), 16, 10) AS BIGINT), 2) = 0 THEN 'control' "
    "ELSE 'treatment' END"
)
_DUCK_ARM = (
    "CASE WHEN (CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || "
    "'#ab1'), 1, 8) AS BIGINT) % 2) = 0 THEN 'control' "
    "ELSE 'treatment' END"
)


@query(
    "ab_test_summary",
    oracle=f"""
    WITH assigned AS (
      SELECT user_id, {_DUCK_ARM} AS arm FROM events GROUP BY user_id
    ),
    per_user AS (
      SELECT a.user_id, a.arm,
             CAST(COUNT(*) FILTER (WHERE e.event_type = 'purchase') AS BIGINT)
               AS purchases,
             COALESCE(SUM(CAST(e.value AS DECIMAL(30,8)))
                        FILTER (WHERE e.event_type = 'purchase'), 0) AS revenue
      FROM assigned a JOIN events e ON a.user_id = e.user_id
      GROUP BY a.user_id, a.arm
    )
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) FILTER (WHERE purchases > 0) AS BIGINT) AS n_converters,
           CAST(SUM(purchases) AS BIGINT) AS n_purchases,
           {o_dsum('CAST(revenue AS DOUBLE)')} AS revenue,
           CAST(COUNT(*) FILTER (WHERE purchases > 0) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS conversion_rate
    FROM per_user
    GROUP BY arm
    """,
)
def ab_test_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm experiment readout over the events stream — see module
    docstring.  One user-keyed aggregate then a 2-row arm rollup; the
    assignment hash rides the same scan (no separate assignment table
    at any scale)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.withColumn("arm", F.expr(_SPARK_ARM))
        .groupBy("user_id", "arm")
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "purchases"
            ),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast("decimal(30,8)"),
                    )
                ),
                F.lit(0).cast("decimal(30,8)"),
            ).alias("revenue"),
        )
    )
    return per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("purchases") > 0, 1)).alias("n_converters"),
        F.sum("purchases").alias("n_purchases"),
        dsum(F.col("revenue").cast("double"), "revenue"),
        (
            F.count(F.when(F.col("purchases") > 0, 1)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("conversion_rate"),
    )


@query(
    "curate_winsorize",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             quantile_disc(value, 0.01) AS p01,
             quantile_disc(value, 0.99) AS p99
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN e.value < s.p01 THEN s.p01
                WHEN e.value > s.p99 THEN s.p99
                ELSE e.value END AS value_winsorized,
           (e.value < s.p01 OR e.value > s.p99) AS clamped
    FROM events e JOIN stats s USING (event_type)
    """,
)
def curate_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization at p01/p99 per event_type (robust clamp before
    training on heavy-tailed values) — exact discrete percentiles, so
    every clamped value is a value that occurs in the data and both
    engines agree bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY value)").alias(
            "p01"
        ),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias(
            "p99"
        ),
    )
    clamped = (F.col("value") < F.col("p01")) | (
        F.col("value") > F.col("p99")
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.when(F.col("value") < F.col("p01"), F.col("p01"))
        .when(F.col("value") > F.col("p99"), F.col("p99"))
        .otherwise(F.col("value"))
        .alias("value_winsorized"),
        clamped.alias("clamped"),
    )


@query(
    "drift_ks_arms",
    oracle=f"""
    WITH p AS (
      SELECT value, {_DUCK_ARM} AS arm FROM events
      WHERE event_type = 'purchase'
    ),
    n AS (
      SELECT
        CAST(COUNT(*) FILTER (WHERE arm = 'control') AS BIGINT) AS n_a,
        CAST(COUNT(*) FILTER (WHERE arm = 'treatment') AS BIGINT) AS n_b
      FROM p
    ),
    per_v AS (
      SELECT value,
             CAST(COUNT(*) FILTER (WHERE arm = 'control') AS BIGINT) AS a,
             CAST(COUNT(*) FILTER (WHERE arm = 'treatment') AS BIGINT) AS b
      FROM p GROUP BY value
    ),
    cum AS (
      SELECT SUM(a) OVER w AS ca, SUM(b) OVER w AS cb
      FROM per_v
      WINDOW w AS (ORDER BY value ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT n.n_a, n.n_b,
           CAST(MAX(ABS(CAST(cum.ca AS DECIMAL(38,0)) * n.n_b
                        - CAST(cum.cb AS DECIMAL(38,0)) * n.n_a))
                AS BIGINT) AS ks_num,
           CAST(CAST(n.n_a AS DECIMAL(38,0)) * n.n_b AS BIGINT)
             AS ks_den,
           CAST(MAX(ABS(CAST(cum.ca AS DECIMAL(38,0)) * n.n_b
                        - CAST(cum.cb AS DECIMAL(38,0)) * n.n_a)) AS DOUBLE)
             / CAST(CAST(n.n_a AS DECIMAL(38,0)) * n.n_b AS DOUBLE)
             AS ks_stat
    FROM cum CROSS JOIN n
    GROUP BY n.n_a, n.n_b
    """,
)
def drift_ks_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS between the arms' purchase-value distributions —
    see module docstring.  D's maximum over x only needs F_a/F_b at the
    distinct observed values, so the frame collapses to per-value pair
    counts first; the empirical-CDF running sums are two-level (bucket
    window + tiny carry), never a global sort."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "value", F.expr(_SPARK_ARM).alias("arm")
    )
    per_v = p.groupBy("value").agg(
        F.count(F.when(F.col("arm") == "control", 1)).alias("a"),
        F.count(F.when(F.col("arm") == "treatment", 1)).alias("b"),
    ).withColumn("bkt", F.floor("value"))
    # level 1: running sums within floor(value) buckets (parallel)
    wloc = (
        Window.partitionBy("bkt")
        .orderBy(F.col("value").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = per_v.select(
        "bkt",
        "value",
        F.sum("a").over(wloc).alias("la"),
        F.sum("b").over(wloc).alias("lb"),
    )
    # level 2: carry-in per bucket — a window over O(value-range) rows
    bt = per_v.groupBy("bkt").agg(
        F.sum("a").alias("ta"), F.sum("b").alias("tb")
    )
    wcarry = Window.orderBy(F.col("bkt").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = bt.select(
        "bkt",
        F.coalesce(F.sum("ta").over(wcarry), F.lit(0)).alias("ca0"),
        F.coalesce(F.sum("tb").over(wcarry), F.lit(0)).alias("cb0"),
    )
    # the arm totals fall out of the bucket-total frame — no third scan
    # of the fact for a 1-row aggregate
    n = bt.agg(
        F.sum("ta").cast("long").alias("n_a"),
        F.sum("tb").cast("long").alias("n_b"),
    )
    cum = loc.join(F.broadcast(carry), "bkt").select(
        (F.col("la") + F.col("ca0")).cast("decimal(38,0)").alias("ca"),
        (F.col("lb") + F.col("cb0")).cast("decimal(38,0)").alias("cb"),
    )
    num = F.max(
        F.abs(
            F.col("ca") * F.col("n_b").cast("decimal(38,0)")
            - F.col("cb") * F.col("n_a").cast("decimal(38,0)")
        )
    ).cast("decimal(38,0)")
    den = (
        F.col("n_a").cast("decimal(38,0)") * F.col("n_b").cast("decimal(38,0)")
    ).cast("decimal(38,0)")
    # Guard the BIGINT output: beyond ~3e9 rows/arm, n_a*n_b exceeds
    # int64 and the non-ANSI decimal->long cast would SILENTLY yield
    # NULL — an overflowed KS readout must fail loudly, not look like
    # missing data (round-7 advice).  raise_error stays JVM-side and
    # costs nothing on the in-bound path.
    _I64_MAX = F.lit("9223372036854775807").cast("decimal(38,0)")
    _guarded_den = F.when(
        den > _I64_MAX,
        F.raise_error(
            F.concat(
                F.lit("drift_ks_arms: n_a*n_b overflows BIGINT (n_a="),
                F.col("n_a").cast("string"),
                F.lit(", n_b="),
                F.col("n_b").cast("string"),
                F.lit("); keep DECIMAL output beyond ~3e9 rows/arm"),
            )
        ).cast("decimal(38,0)"),
    ).otherwise(den)
    return (
        cum.crossJoin(F.broadcast(n))
        .groupBy("n_a", "n_b")
        .agg(num.alias("ks_num"))
        .select(
            "n_a",
            "n_b",
            # the INTERNAL cross-products ride DECIMAL(38,0) (no int64
            # overflow at any corpus size); the OUTPUT casts to BIGINT
            # because the driver's value-hash stringifies Decimal and
            # DOUBLE differently (round-7 window simulation catch) —
            # the output bound n_a*n_b <= 9.2e18 holds to ~3e9 rows/arm
            # and is runtime-enforced by _guarded_den above
            F.col("ks_num").cast("long").alias("ks_num"),
            _guarded_den.cast("long").alias("ks_den"),
            (
                F.col("ks_num").cast("double") / den.cast("double")
            ).alias("ks_stat"),
        )
    )

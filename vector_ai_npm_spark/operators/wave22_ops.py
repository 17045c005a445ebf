"""Wave 22: inter-arrival statistics, DAU/MAU stickiness, audience
overlap.

Three behavioral-analytics operators, each exact and oracle-checked:

* `events_interarrival` — the inter-event gap profile (bot/crawler
  detection input: machine traffic shows impossibly tight and
  impossibly regular gaps): per-user consecutive-event gaps in EXACT
  integer microseconds, folded to one row with the exact mean
  (Σgap_us / n, both integers) and exact second-resolution
  p50/p90/p99 discrete quantiles.  The quantile pass rides the
  distinct-value + two-level-prefix shape of `agg_percentile_dist` /
  `functions.prefix` — no global sort, no unpartitioned corpus
  window, no per-task value multiset.
* `cohort_stickiness` — the DAU/MAU curve (the "how habitual is
  usage" growth metric next to `rolling_active_users`' WAU): MAU via
  the same explode-instead-of-range-join trick (a user active on day
  d counts toward the 30 as-of days d..d+29), DAU a plain per-day
  count over the distinct (user, day) frame, stickiness = DAU/MAU an
  exact integer fraction.
* `events_audience_overlap` — pairwise audience Jaccard between event
  types (the "do clickers also purchase" audience matrix): per-user
  distinct types self-joined on user_id (fan-out ≤ C(|types|, 2) per
  user — type-domain-bounded, never a cross join), totals broadcast,
  overlap = |A∩B|/(|A|+|B|−|A∩B|) exact.

Cross-engine determinism: integer microseconds end-to-end (NTZ-safe
timestampdiff idiom), exact int64 fractions, each final double ONE
identical expression in both engines.

Scale shape: every operator's first move reduces the corpus —
(user, consecutive-pair) gaps collapse to second-resolution distinct
values; (user, day) distinct for stickiness (the only event-scale
pass); (user, type) distinct for overlap.  Later stages run on
value-/day-/type-bounded frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.prefix import cum_before
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_US_PER_S = 1_000_000
_PREFIX_BUCKET_S = 3600  # second-resolution gaps bucket into hours


@query(
    "events_interarrival",
    oracle=f"""
    WITH g AS (
      SELECT epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    gaps AS (
      SELECT gap_us, gap_us // {_US_PER_S} AS gap_s
      FROM g WHERE gap_us IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(CAST(gap_us AS DECIMAL(38,0))) AS BIGINT)
             AS sum_gap_us,
           CAST(SUM(CAST(gap_us AS DECIMAL(38,0))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mean_gap_us,
           CAST(quantile_disc(gap_s, 0.5) AS BIGINT) AS p50_s,
           CAST(quantile_disc(gap_s, 0.9) AS BIGINT) AS p90_s,
           CAST(quantile_disc(gap_s, 0.99) AS BIGINT) AS p99_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
    FROM gaps
    """,
)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap profile — see module docstring.  The lag
    window is user-partitioned (distributed); gaps collapse to
    second-resolution distinct values before the quantile pass, whose
    only unpartitioned window is the hour-bucket carry frame
    (functions.prefix contract); quantiles compare in integer
    arithmetic (cum·100 ≥ p·n — the agg_percentile_dist idiom)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gaps = (
        ev.select(
            "user_id", "ts", "event_id",
            F.lag("ts").over(w).alias("prev_ts"),
        )
        .where(F.col("prev_ts").isNotNull())
        .select(
            F.expr("timestampdiff(MICROSECOND, prev_ts, ts)").alias("gap_us")
        )
        .select("gap_us", (F.col("gap_us") / _US_PER_S).cast("long").alias(
            "gap_s"
        ))
    )
    fold = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum(F.col("gap_us").cast("decimal(38,0)"))
        .cast("bigint")
        .alias("sum_gap_us"),
    )
    vc = gaps.groupBy("gap_s").agg(F.count(F.lit(1)).alias("cnt"))
    cum = cum_before(vc, "gap_s", "cnt", _PREFIX_BUCKET_S).select(
        "gap_s", (F.col("cum_before") + F.col("cnt")).alias("cum")
    )
    quant = cum.crossJoin(
        F.broadcast(fold.select(F.col("n_gaps").alias("n")))
    )

    def q(p100: int, alias: str):
        return F.min(
            F.when(
                F.col("cum") * 100 >= F.lit(p100) * F.col("n"),
                F.col("gap_s"),
            )
        ).cast("bigint").alias(alias)

    qrow = quant.agg(
        q(50, "p50_s"), q(90, "p90_s"), q(99, "p99_s"),
        F.max("gap_s").cast("bigint").alias("max_gap_s"),
    )
    return fold.crossJoin(F.broadcast(qrow)).select(
        "n_gaps",
        "sum_gap_us",
        (
            F.col("sum_gap_us").cast("double")
            / F.col("n_gaps").cast("double")
        ).alias("mean_gap_us"),
        "p50_s", "p90_s", "p99_s", "max_gap_s",
    )


_MAU_DAYS = 30


@query(
    "cohort_stickiness",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), span AS (
      SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud
    ), dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ), cover AS (
      SELECT user_id,
             CAST(unnest(generate_series(day, day + {_MAU_DAYS - 1},
                                         INTERVAL 1 DAY)) AS DATE)
               AS as_of_day
      FROM ud
    ), mau AS (
      SELECT c.as_of_day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS mau
      FROM cover c, span s
      WHERE c.as_of_day BETWEEN s.d0 AND s.d1
      GROUP BY c.as_of_day
    )
    SELECT m.as_of_day AS day, COALESCE(d.dau, 0) AS dau, m.mau,
           CAST(COALESCE(d.dau, 0) AS DOUBLE) / CAST(m.mau AS DOUBLE)
             AS stickiness
    FROM mau m LEFT JOIN dau d ON d.day = m.as_of_day
    """,
)
def cohort_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness — see module docstring.  One event-scale
    pass (the DISTINCT (user, day) collapse); MAU rides a 30× map-side
    fan-out of that user×day frame (explode, JVM Generate — the
    rolling_active_users trick at window 30), DAU and the join are
    day-frame-sized.  stickiness = dau/mau is exact (both BIGINT, one
    correctly-rounded division)."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    span = ud.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    cover = ud.select(
        "user_id",
        F.explode(
            F.expr(
                f"sequence(day, date_add(day, {_MAU_DAYS - 1}), "
                "interval 1 day)"
            )
        ).alias("as_of_day"),
    )
    mau = (
        cover.crossJoin(F.broadcast(span))
        .where(F.col("as_of_day").between(F.col("d0"), F.col("d1")))
        .groupBy("as_of_day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("mau"))
    )
    return (
        mau.join(dau, mau["as_of_day"] == dau["day"], "left")
        .select(
            F.col("as_of_day").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0)).cast("bigint").alias("dau"),
            "mau",
            (
                F.coalesce(F.col("dau"), F.lit(0)).cast("double")
                / F.col("mau").cast("double")
            ).alias("stickiness"),
        )
    )


@query(
    "events_audience_overlap",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), nt AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM ut GROUP BY event_type
    ), common AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS common_users
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT c.type_a, c.type_b, na.n_users AS users_a,
           nb.n_users AS users_b, c.common_users,
           c.common_users AS jac_num,
           na.n_users + nb.n_users - c.common_users AS jac_den,
           CAST(c.common_users AS DOUBLE)
             / CAST(na.n_users + nb.n_users - c.common_users AS DOUBLE)
             AS jaccard
    FROM common c
    JOIN nt na ON na.event_type = c.type_a
    JOIN nt nb ON nb.event_type = c.type_b
    """,
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience Jaccard between event types — see module
    docstring.  The self-join is user-keyed with a type inequality
    post-filter (per-user fan-out ≤ C(|types|, 2), a domain constant);
    type totals broadcast onto the ≤|types|² pair matrix."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    nt = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    a = ut.alias("a")
    b = ut.alias("b")
    common = (
        a.join(b, "user_id")
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_users"))
    )
    na = nt.select(
        F.col("event_type").alias("type_a"),
        F.col("n_users").alias("users_a"),
    )
    nb = nt.select(
        F.col("event_type").alias("type_b"),
        F.col("n_users").alias("users_b"),
    )
    den = F.col("users_a") + F.col("users_b") - F.col("common_users")
    return (
        common.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a", "type_b", "users_a", "users_b", "common_users",
            F.col("common_users").alias("jac_num"),
            den.alias("jac_den"),
            (F.col("common_users").cast("double") / den.cast("double")).alias(
                "jaccard"
            ),
        )
    )

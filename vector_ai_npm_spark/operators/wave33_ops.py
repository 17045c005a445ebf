"""Wave 33: Kendall rank correlation, seasonal forecast error,
deterministic bootstrap CI, Zipf rank-frequency ratios.

Four evaluation/statistics operators, each exact, oracle-checked, and
scale-shaped:

* `eval_kendall_tau` — Kendall's τ_a between the shared synthetic
  model score (eval_metrics.CAL_SCORED_SQL) and a second
  deterministic score, computed the SCALE-SAFE way: a FIXED-SIZE
  deterministic sample (top-2000 by md5(id) — exactly N rows at any
  corpus size, TakeOrderedAndProject, the same draw in both engines)
  reduced to the JOINT HISTOGRAM of (x, y) score cells (one groupBy),
  then concordant / discordant / tied pair counts over histogram-cell
  pairs weighted by n_a·n_b.  Pair work is O(min(sample, domain)²),
  constant in corpus size — the first (sample-free) version measured
  9.6× wall at the 10× replica because cells don't saturate the 951²
  domain until the corpus far exceeds it (round-9 scale study);
  rank correlation over a fixed uniform sample is also how production
  systems compute it.  τ_a = (C − D) / C(N,2) is an exact
  integer ratio; τ_b's denominator needs a sqrt, so the face reports
  the τ_b pieces (tie-corrected marginals) as exact integers and τ_a
  as the headline double.
* `events_mase_seasonal` — MASE with a weekly season on per-type
  daily event counts: seasonal-naive absolute error (|c_t − c_{t−7}|,
  row-based over observed days) over one-step-naive absolute error,
  normalized per step — all integer sums, one exact ratio.  The
  standard "is my forecast better than the naive" yardstick, here
  auditing how periodic each event stream is.
* `ab_bootstrap_ci` — a DETERMINISTIC multiplier bootstrap for the
  mean purchase value per user: rep r weights each user by
  w = 2·(md5(user‖r) mod 2) ∈ {0, 2} (mean-one multiplier), giving
  101 resampled means whose 5th/50th/95th order statistics are the
  CI.  Everything is exact integer cents until one final division per
  rep; the hash makes both engines draw the SAME bootstrap.  Fan-out
  is a constant 101 reps over the (already user-reduced) frame — at
  100 TB this is 101 map-side weighted partial sums, no row-level
  resample materialization.
* `text_zipf_ratio` — the rank-frequency profile: frequency at ranks
  1, 2, 4, …, 512 (deterministic freq-desc/term-asc ranking) and the
  exact f₁/f_k ratio.  Zipf's law predicts ratio ≈ k; the readout is
  the standard corpus-health check (a crawl whose curve flattens is
  template-heavy).  Rank window runs on the type-level term frame
  (vocabulary-bounded), never on token rows.

Cross-engine determinism: md5-derived randomness (the
curation_dq.py:281 idiom), integer tallies, each final double ONE
identical expression in both engines; no ln(), no decimal casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.eval_metrics import (
    CAL_SCORED_SQL,
    _duck_hash_mod,
    _spark_hash_mod,
)
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.text.queries import _DUCK_TOKS, _SPARK_TOKS

# --------------------------------------------------------------------------
# eval_kendall_tau
# --------------------------------------------------------------------------

# second deterministic score, same label signal through different noise
_Y_SCORE_DUCK = (
    f"{_duck_hash_mod('vec_id', '#kt2', 600)}"
    " + CASE WHEN label < 5 THEN 300 ELSE 100 END"
)


_KT_SAMPLE = 2000  # fixed-size deterministic sample: pair work is
# O(sample²) at ANY corpus size.  Without it the histogram-pair join
# is quadratic until the corpus saturates the score domain — measured
# 9.6× wall at the 10× replica (round-9 scale study), the exact
# failure mode this cap removes.  ORDER BY md5(id) LIMIT N is the
# engine-identical "uniform sample of exactly N" idiom
# (TakeOrderedAndProject on the Spark side — never a global sort).


@query(
    "eval_kendall_tau",
    oracle=f"""
    WITH sample AS (
      SELECT vec_id, label FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR) || '#ktsample'), vec_id
      LIMIT {_KT_SAMPLE}
    ), scored AS (
      SELECT CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos,
             {_duck_hash_mod("vec_id", "#cal", 600)}
               + CASE WHEN label < 5 THEN 350 ELSE 50 END AS x,
             {_Y_SCORE_DUCK} AS y
      FROM sample
    ), hist AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n
      FROM scored GROUP BY x, y
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS big_n,
             CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS tie_both
      FROM hist
    ), pairs AS (
      SELECT
        CAST(SUM(CASE WHEN a.x < b.x AND a.y < b.y
                      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS concordant,
        CAST(SUM(CASE WHEN a.x < b.x AND a.y > b.y
                      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS discordant,
        CAST(SUM(CASE WHEN a.x = b.x AND a.y < b.y
                      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS tie_x_only,
        CAST(SUM(CASE WHEN a.x < b.x AND a.y = b.y
                      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS tie_y_only
      FROM hist a JOIN hist b
        ON (a.x < b.x) OR (a.x = b.x AND a.y < b.y)
    )
    SELECT t.big_n AS n,
           CAST(t.big_n * (t.big_n - 1) // 2 AS BIGINT) AS n_pairs,
           p.concordant, p.discordant,
           p.tie_x_only, p.tie_y_only, t.tie_both,
           CAST(p.concordant - p.discordant AS DOUBLE)
             / CAST(t.big_n * (t.big_n - 1) // 2 AS DOUBLE) AS tau_a
    FROM pairs p, tot t
    """,
)
def eval_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ_a via the joint score histogram — see module
    docstring.  The only join is histogram-cell × histogram-cell
    (score-domain-bounded, ≤ 951² cells whatever the corpus size);
    the corpus itself is touched once by the groupBy."""
    emb = load_table(spark, sf_dir, "embeddings")
    sample = (
        emb.select("vec_id", "label")
        .orderBy(
            F.md5(
                F.concat(F.col("vec_id").cast("string"), F.lit("#ktsample"))
            ),
            "vec_id",
        )
        .limit(_KT_SAMPLE)
    )
    scored = sample.select(
        (
            _spark_hash_mod(F.col("vec_id"), "#cal", 600)
            + F.when(F.col("label") < 5, 350).otherwise(50)
        ).alias("x"),
        (
            _spark_hash_mod(F.col("vec_id"), "#kt2", 600)
            + F.when(F.col("label") < 5, 300).otherwise(100)
        ).alias("y"),
    )
    # the histogram is consumed three times (self-join both sides +
    # totals); checkpoint it so the corpus is scanned ONCE — without
    # this the plan re-derives hist per consumer (3 parquet scans)
    hist = (
        scored.groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = hist.agg(
        F.sum("n").cast("bigint").alias("big_n"),
        F.sum(
            (F.col("n") * (F.col("n") - 1) / 2).cast("bigint")
        ).cast("bigint").alias("tie_both"),
    )
    a, b = hist.alias("a"), hist.alias("b")
    lt = F.col("a.x") < F.col("b.x")
    pairs = (
        a.join(
            b,
            lt | ((F.col("a.x") == F.col("b.x")) & (F.col("a.y") < F.col("b.y"))),
        )
        .agg(
            F.sum(
                F.when(lt & (F.col("a.y") < F.col("b.y")),
                       F.col("a.n") * F.col("b.n")).otherwise(0)
            ).cast("bigint").alias("concordant"),
            F.sum(
                F.when(lt & (F.col("a.y") > F.col("b.y")),
                       F.col("a.n") * F.col("b.n")).otherwise(0)
            ).cast("bigint").alias("discordant"),
            F.sum(
                F.when((F.col("a.x") == F.col("b.x"))
                       & (F.col("a.y") < F.col("b.y")),
                       F.col("a.n") * F.col("b.n")).otherwise(0)
            ).cast("bigint").alias("tie_x_only"),
            F.sum(
                F.when(lt & (F.col("a.y") == F.col("b.y")),
                       F.col("a.n") * F.col("b.n")).otherwise(0)
            ).cast("bigint").alias("tie_y_only"),
        )
    )
    n_pairs = (F.col("big_n") * (F.col("big_n") - 1) / 2).cast("bigint")
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            F.col("big_n").alias("n"),
            n_pairs.alias("n_pairs"),
            "concordant", "discordant",
            "tie_x_only", "tie_y_only", "tie_both",
            (
                (F.col("concordant") - F.col("discordant")).cast("double")
                / n_pairs.cast("double")
            ).alias("tau_a"),
        )
    )


# --------------------------------------------------------------------------
# events_mase_seasonal
# --------------------------------------------------------------------------

_SEASON = 7


@query(
    "events_mase_seasonal",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, c,
             LAG(c, 1) OVER w AS c1,
             LAG(c, {_SEASON}) OVER w AS c7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN c7 IS NOT NULL THEN ABS(c - c7) END)
                AS BIGINT) AS sae_seasonal,
           CAST(COUNT(c7) AS BIGINT) AS n_seasonal,
           CAST(SUM(CASE WHEN c1 IS NOT NULL THEN ABS(c - c1) END)
                AS BIGINT) AS sae_naive1,
           CAST(COUNT(c1) AS BIGINT) AS n_naive1,
           (CAST(SUM(CASE WHEN c7 IS NOT NULL THEN ABS(c - c7) END)
                 AS DOUBLE) * CAST(COUNT(c1) AS DOUBLE))
             / (CAST(SUM(CASE WHEN c1 IS NOT NULL THEN ABS(c - c1) END)
                     AS DOUBLE) * CAST(COUNT(c7) AS DOUBLE)) AS mase
    FROM lagged GROUP BY event_type
    """,
)
def events_mase_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-seasonal MASE on daily event counts — see module
    docstring.  The corpus reduces to (type, day) counts in the first
    aggregate; the lag windows run on the day-bounded frame,
    partitioned by type."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", _SEASON).over(w).alias("c7"),
    )
    sae7 = F.sum(
        F.when(F.col("c7").isNotNull(), F.abs(F.col("c") - F.col("c7")))
    ).cast("bigint")
    sae1 = F.sum(
        F.when(F.col("c1").isNotNull(), F.abs(F.col("c") - F.col("c1")))
    ).cast("bigint")
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        sae7.alias("sae_seasonal"),
        F.count("c7").cast("bigint").alias("n_seasonal"),
        sae1.alias("sae_naive1"),
        F.count("c1").cast("bigint").alias("n_naive1"),
        (
            (sae7.cast("double") * F.count("c1").cast("double"))
            / (sae1.cast("double") * F.count("c7").cast("double"))
        ).alias("mase"),
    )


# --------------------------------------------------------------------------
# ab_bootstrap_ci
# --------------------------------------------------------------------------

_N_REPS = 101
_CENTS = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"


@query(
    "ab_bootstrap_ci",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, CAST(SUM({_CENTS}) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), reps AS (
      SELECT r FROM range({_N_REPS}) t(r)
    ), weighted AS (
      SELECT r.r,
             2 * ({_duck_hash_mod("u.user_id || '#' || r.r", "#bs", 2)})
               AS w,
             u.cents
      FROM per_user u CROSS JOIN reps r
    ), rep_means AS (
      SELECT r,
             CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
               AS mean_cents
      FROM weighted GROUP BY r
    ), ranked AS (
      SELECT mean_cents,
             ROW_NUMBER() OVER (ORDER BY mean_cents, r) AS rk
      FROM rep_means
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM per_user) AS n_users,
           CAST({_N_REPS} AS BIGINT) AS n_reps,
           MAX(CASE WHEN rk = 6 THEN mean_cents END) AS p05_mean_cents,
           MAX(CASE WHEN rk = 51 THEN mean_cents END) AS p50_mean_cents,
           MAX(CASE WHEN rk = 96 THEN mean_cents END) AS p95_mean_cents
    FROM ranked
    """,
)
def ab_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multiplier bootstrap — see module docstring.
    The per-user reduce happens FIRST; the 101-rep fan-out is a
    constant-factor map over that reduced frame, and each rep folds
    to one (Σw·cents, Σw) pair map-side.  The rank window runs over
    exactly 101 rows."""
    ev = load_table(spark, sf_dir, "events")
    # consumed twice (rep fan-out + n_users); checkpoint the (small)
    # user frame so the event corpus is scanned once
    per_user = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr(_CENTS)).cast("bigint").alias("cents")
        )
        .localCheckpoint(eager=True)
    )
    reps = spark.range(_N_REPS).select(F.col("id").alias("r"))
    weighted = per_user.crossJoin(F.broadcast(reps)).select(
        "r", "cents",
        (
            2
            * _spark_hash_mod(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit("#"),
                    F.col("r").cast("string"),
                ),
                "#bs",
                2,
            )
        ).alias("w"),
    )
    rep_means = weighted.groupBy("r").agg(
        (
            F.sum(F.col("w") * F.col("cents")).cast("double")
            / F.sum("w").cast("double")
        ).alias("mean_cents")
    )
    ranked = rep_means.select(
        "mean_cents",
        F.row_number()
        .over(Window.orderBy("mean_cents", "r"))
        .alias("rk"),
    )
    n_users = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    return (
        ranked.agg(
            F.max(F.when(F.col("rk") == 6, F.col("mean_cents"))).alias(
                "p05_mean_cents"
            ),
            F.max(F.when(F.col("rk") == 51, F.col("mean_cents"))).alias(
                "p50_mean_cents"
            ),
            F.max(F.when(F.col("rk") == 96, F.col("mean_cents"))).alias(
                "p95_mean_cents"
            ),
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "n_users",
            F.lit(_N_REPS).cast("bigint").alias("n_reps"),
            "p05_mean_cents", "p50_mean_cents", "p95_mean_cents",
        )
    )


# --------------------------------------------------------------------------
# text_zipf_ratio
# --------------------------------------------------------------------------

_ZIPF_RANKS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


@query(
    "text_zipf_ratio",
    oracle=f"""
    WITH t AS (
      SELECT unnest({_DUCK_TOKS}) AS tok FROM documents
    ), freqs AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
      FROM t GROUP BY tok
    ), ranked AS (
      SELECT tok, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rk
      FROM freqs
    ), top AS (
      SELECT freq AS f1 FROM ranked WHERE rk = 1
    )
    SELECT CAST(r.rk AS BIGINT) AS rank_k, r.tok AS term, r.freq,
           CAST(t.f1 AS DOUBLE) / CAST(r.freq AS DOUBLE) AS ratio_to_top
    FROM ranked r, top t
    WHERE r.rk IN {_ZIPF_RANKS}
    """,
)
def text_zipf_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-frequency (Zipf) profile — see module docstring.  Token
    rows reduce to the vocabulary frame in the first aggregate; the
    rank window is vocabulary-bounded.  At 100 TB the window would be
    replaced by the two-level-prefix rank (functions.prefix) — here
    the vocabulary is small enough that the single window is the
    honest plan."""
    docs = load_table(spark, sf_dir, "documents")
    freqs = (
        docs.select(F.explode(F.expr(_SPARK_TOKS)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    ranked = freqs.select(
        "tok", "freq",
        F.row_number()
        .over(Window.orderBy(F.col("freq").desc(), F.col("tok")))
        .alias("rk"),
    )
    # f1 via a window over the ALREADY-FILTERED ≤10-row frame (rank 1
    # is in the rank set) — a separate rank=1 subquery would re-derive
    # the whole tokenize pipeline and scan the corpus twice (the plan
    # gate pins exactly one Generate)
    picked = ranked.where(F.col("rk").isin(*_ZIPF_RANKS))
    w_all = Window.partitionBy()
    return picked.select(
        F.col("rk").cast("bigint").alias("rank_k"),
        F.col("tok").alias("term"),
        "freq",
        (
            F.max(F.when(F.col("rk") == 1, F.col("freq")))
            .over(w_all)
            .cast("double")
            / F.col("freq").cast("double")
        ).alias("ratio_to_top"),
    )

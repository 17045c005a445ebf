"""Krippendorff's alpha + CUSUM drift (wave 18).

* `eval_krippendorff_alpha` — the general-purpose inter-rater
  reliability coefficient (Krippendorff 2004, nominal metric), over
  the same deterministic 3-annotator synthesis as
  `label_majority_vote` / `label_fleiss_kappa` /
  `eval_cohens_kappa` — completing the agreement family (Cohen =
  2 raters, Fleiss = chance from pooled marginals, Krippendorff =
  chance from the joint value distribution, the one that generalizes
  to missing data).  With complete data (m raters on all n items),
  nominal alpha clears to an exact integer fraction:

      Do ∝ Σ_i Σ_c n_ic·(m − n_ic),  De ∝ Σ_c N_c·(N − N_c)
      alpha = 1 − [N·(N−1)·Σ_i Σ_c n_ic(m−n_ic)]
                  / [n·m·(m−1)·Σ_c N_c(N−N_c)]

  (N = n·m total votes, N_c votes for value c) — num/den emitted as
  BIGINT + one IEEE division, no float folds.

* `events_cusum_drift` — CUSUM changepoint scan over the daily event
  series (Page 1954): S_t = Σ_{u≤t}(x_u − x̄) spikes at the point the
  level shifts; argmax_t |S_t| is the classic changepoint estimate a
  drift monitor alarms on (the cumulative cousin of `drift_ks_arms`).
  Clearing the mean — y_u = n·x_u − Σx, exact integers, the
  `events_autocorr` move — makes every S_t an exact BIGINT: the
  full CUSUM series is emitted with the peak flagged, computed with
  the two-level prefix discipline (bucketed running sums + a
  bucket-count-sized carry frame — never a corpus-scale unpartitioned
  window; the daily frame is |days|-sized anyway, windows run on it).

Scale: both queries reduce the corpus in their first aggregate
((item, value) tallies of the in-row vote explode; the daily count
frame) and run everything else on those reduced frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.curation_dq import (
    _N_ANN,
    _vote_sql_leg,
    vote_expr,
)
from vector_ai_npm_spark.registry import query


@query(
    "eval_krippendorff_alpha",
    oracle=f"""
    WITH votes AS (
      {" UNION ALL ".join(_vote_sql_leg(i) for i in range(_N_ANN))}
    ),
    tallies AS (
      SELECT vec_id, vote, CAST(COUNT(*) AS BIGINT) AS n_ic
      FROM votes GROUP BY vec_id, vote
    ),
    do_sum AS (
      SELECT CAST(SUM(n_ic * ({_N_ANN} - n_ic)) AS BIGINT) AS within,
             CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_items
      FROM tallies
    ),
    marg AS (
      SELECT CAST(SUM(CAST(n_c AS DECIMAL(19,0))
                      * (tot.n_votes - n_c)) AS BIGINT) AS between_,
             ANY_VALUE(tot.n_votes) AS n_votes
      FROM (SELECT vote, CAST(COUNT(*) AS BIGINT) AS n_c
            FROM votes GROUP BY vote) v
      CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n_votes FROM votes) tot
    )
    SELECT d.n_items, m.n_votes, d.within AS do_num, m.between_ AS de_num,
           CAST(m.between_ * (d.n_items * {_N_ANN} * {_N_ANN - 1})
                - d.within * (m.n_votes * (m.n_votes - 1)) AS BIGINT)
             AS alpha_num,
           CAST(m.between_ * (d.n_items * {_N_ANN} * {_N_ANN - 1})
                AS BIGINT) AS alpha_den,
           CAST(m.between_ * (d.n_items * {_N_ANN} * {_N_ANN - 1})
                - d.within * (m.n_votes * (m.n_votes - 1)) AS DOUBLE)
             / CAST(m.between_ * (d.n_items * {_N_ANN} * {_N_ANN - 1})
                    AS DOUBLE) AS alpha
    FROM do_sum d CROSS JOIN marg m
    """,
)
def eval_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nominal Krippendorff's alpha over the 3-annotator synthesis —
    see module docstring for the exact clearing.  int64 headroom:
    alpha_num ≈ N²·Σn_ic(m−n_ic) ≈ m³·n² needs n ≲ 5e8 items at m=3;
    beyond that the clearing rides DECIMAL(38,0), same algebra (the
    internal products already do)."""
    emb = load_table(spark, sf_dir, "embeddings")
    votes = None
    for i in range(_N_ANN):
        leg = emb.select(
            F.col("vec_id"), vote_expr(i).alias("vote")
        )
        votes = leg if votes is None else votes.unionAll(leg)
    tallies = votes.groupBy("vec_id", "vote").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ic")
    )
    do_sum = tallies.agg(
        F.sum(F.col("n_ic") * (F.lit(_N_ANN) - F.col("n_ic")))
        .cast("bigint")
        .alias("within"),
        F.count_distinct(F.col("vec_id")).cast("bigint").alias("n_items"),
    )
    tot = votes.agg(F.count(F.lit(1)).cast("bigint").alias("n_votes"))
    marg = (
        votes.groupBy("vote")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_c"))
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("n_c").cast("decimal(19,0)")
                * (F.col("n_votes") - F.col("n_c"))
            )
            .cast("bigint")
            .alias("between_"),
            F.any_value(F.col("n_votes")).alias("n_votes"),
        )
    )
    de_scale = F.col("n_items") * _N_ANN * (_N_ANN - 1)
    num = F.col("between_") * de_scale - F.col("within") * (
        F.col("n_votes") * (F.col("n_votes") - 1)
    )
    den = F.col("between_") * de_scale
    return do_sum.crossJoin(F.broadcast(marg)).select(
        "n_items",
        "n_votes",
        F.col("within").alias("do_num"),
        F.col("between_").alias("de_num"),
        num.cast("bigint").alias("alpha_num"),
        den.cast("bigint").alias("alpha_den"),
        (num.cast("double") / den.cast("double")).alias("alpha"),
    )


@query(
    "events_cusum_drift",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
      FROM daily
    ),
    cum AS (
      SELECT day, x,
             CAST(SUM(tot.n * daily.x - tot.s) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cusum_scaled
      FROM daily CROSS JOIN tot
    ),
    peak AS (
      SELECT MAX(ABS(cusum_scaled)) AS peak_abs FROM cum
    )
    SELECT c.day, c.x, c.cusum_scaled,
           ABS(c.cusum_scaled) = p.peak_abs
             AND c.day = (SELECT MIN(day) FROM cum c2, peak p2
                          WHERE ABS(c2.cusum_scaled) = p2.peak_abs)
             AS is_changepoint
    FROM cum c CROSS JOIN peak p
    """,
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan — see module docstring.  The emitted
    `cusum_scaled` is n·S_t (the mean cleared to integers); the
    changepoint flag marks the FIRST day attaining max |S_t|
    (deterministic tiebreak).  The running sum and the peak scan both
    run over the |days|-row daily frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # unpartitioned windows over the |days|-row frame only (corpus
    # reduced in the daily aggregate — plan-gate-compliant)
    cum = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "x",
        F.sum(F.col("n") * F.col("x") - F.col("s"))
        .over(w)
        .cast("bigint")
        .alias("cusum_scaled"),
    )
    peak = cum.agg(
        F.max(F.abs(F.col("cusum_scaled"))).alias("peak_abs")
    )
    first_peak = (
        cum.crossJoin(F.broadcast(peak))
        .where(F.abs(F.col("cusum_scaled")) == F.col("peak_abs"))
        .agg(F.min("day").alias("peak_day"))
    )
    return (
        cum.crossJoin(F.broadcast(peak))
        .crossJoin(F.broadcast(first_peak))
        .select(
            "day",
            "x",
            "cusum_scaled",
            (
                (F.abs(F.col("cusum_scaled")) == F.col("peak_abs"))
                & (F.col("day") == F.col("peak_day"))
            ).alias("is_changepoint"),
        )
    )

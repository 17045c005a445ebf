"""Agreement & calibration metrics (wave 17): MCC sweep, Cohen's
kappa, ECE.

Three label-quality readouts a training-data/eval pipeline runs next
to the wave-13/14 suite (eval_metrics.py, feature_ops.py):

* `eval_mcc_threshold` — Matthews correlation coefficient at the same
  9 fixed thresholds as `eval_confusion_threshold`.  MCC is the
  balanced single-number summary precision/recall/F1 are not (Chicco &
  Jurman 2020); its numerator tp·tn − fp·fn is an exact integer and
  its denominator one sqrt of an exact integer product — sqrt is
  IEEE-correctly-rounded in both engines, so the float is
  bit-deterministic.
* `eval_cohens_kappa` — two-rater chance-corrected agreement (Cohen
  1960) between deterministic annotators #0 and #1 of the
  `label_majority_vote` synthesis (operators/curation_dq.py:289).
  Clearing n² gives kappa = (n·agree − Σ_c r1_c·r2_c) /
  (n² − Σ_c r1_c·r2_c) — an exact int64 fraction, emitted as num/den
  + one division.  Complements `label_fleiss_kappa` (≥3 raters,
  per-item tables) with the two-rater confusion form.
* `eval_ece` — expected calibration error over the
  `eval_calibration_bins` decile frame.  The textbook Σ_b n_b·|acc_b −
  conf_b| / N telescopes EXACTLY: gap_b = |1000·n_pos_b − S_b| /
  (1000·n_b) with S_b = Σ s_milli, so the n_b cancels and
  ECE = Σ_b |1000·n_pos_b − S_b| / (1000·N) — one integer sum, one
  division, no per-bin float folds to order.

Cross-engine determinism follows the wave-13 contract: integer/decimal
folds only, each final float one identical double expression, DuckDB
decimal→double hops through the varchar bridge.

Scale shape: each metric reduces the corpus in its FIRST aggregate
(distinct milli-scores ≤1000 rows; 10×10 rater confusion; 10 bins) and
every later stage runs on that reduced frame — corpus scans once,
nothing corpus-sized shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.curation_dq import _vote_sql_leg, vote_expr
from vector_ai_npm_spark.operators.eval_metrics import (
    CAL_SCORED_SQL,
    _o_d2d,
    cal_scored,
)
from vector_ai_npm_spark.operators.feature_ops import _THRESHOLDS
from vector_ai_npm_spark.registry import query


@query(
    "eval_mcc_threshold",
    oracle=f"""
    WITH scored AS (
{CAL_SCORED_SQL}
    ), by_score AS (
      SELECT s_milli, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS n_pos
      FROM scored GROUP BY s_milli
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_all,
             CAST(SUM(n_pos) AS BIGINT) AS p_all
      FROM by_score
    ), lat AS (
      SELECT t.threshold,
             CAST(SUM(CASE WHEN s.s_milli >= t.threshold
                           THEN s.n_pos ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN s.s_milli >= t.threshold
                           THEN s.n - s.n_pos ELSE 0 END) AS BIGINT) AS fp
      FROM (VALUES {", ".join(f"({t})" for t in _THRESHOLDS)}) AS t(threshold)
      CROSS JOIN by_score s
      GROUP BY t.threshold
    ), conf AS (
      SELECT CAST(threshold AS BIGINT) AS threshold, tp, fp,
             p_all - tp AS fn, n_all - p_all - fp AS tn
      FROM lat CROSS JOIN tot
    )
    SELECT threshold, tp, fp, fn, tn,
           CAST(CAST(tp AS DECIMAL(19,0)) * tn
                - CAST(fp AS DECIMAL(19,0)) * fn AS BIGINT) AS mcc_num,
           CASE WHEN (tp+fp) > 0 AND (tp+fn) > 0
                 AND (tn+fp) > 0 AND (tn+fn) > 0 THEN
             {_o_d2d("CAST(CAST(tp AS DECIMAL(19,0)) * tn - CAST(fp AS DECIMAL(19,0)) * fn AS DECIMAL(38,0))")}
             / SQRT({_o_d2d("CAST(CAST((tp+fp) AS DECIMAL(19,0)) * (tp+fn) AS DECIMAL(38,0)) * (CAST((tn+fp) AS DECIMAL(19,0)) * (tn+fn))")})
           END AS mcc
    FROM conf
    """,
)
def eval_mcc_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MCC sweep over the shared model-score fixture — see module
    docstring.  The sweep reuses the `eval_confusion_threshold` lattice
    shape: corpus → ≤1000-row distinct-score aggregate, 9-threshold
    fold over THAT frame, totals broadcast."""
    scored = cal_scored(load_table(spark, sf_dir, "embeddings"))
    by_score = scored.groupBy("s_milli").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    tot = by_score.agg(
        F.sum("n").cast("bigint").alias("n_all"),
        F.sum("n_pos").cast("bigint").alias("p_all"),
    )
    lat = (
        by_score.select(
            "s_milli",
            "n",
            "n_pos",
            F.explode(F.array(*[F.lit(t) for t in _THRESHOLDS])).alias(
                "threshold"
            ),
        )
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when(F.col("s_milli") >= F.col("threshold"), F.col("n_pos"))
                .otherwise(0)
            ).cast("bigint").alias("tp"),
            F.sum(
                F.when(
                    F.col("s_milli") >= F.col("threshold"),
                    F.col("n") - F.col("n_pos"),
                ).otherwise(0)
            ).cast("bigint").alias("fp"),
        )
    )
    conf = lat.crossJoin(F.broadcast(tot)).select(
        F.col("threshold").cast("bigint").alias("threshold"),
        "tp",
        "fp",
        (F.col("p_all") - F.col("tp")).alias("fn"),
        (F.col("n_all") - F.col("p_all") - F.col("fp")).alias("tn"),
    )
    d = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    num = (d(F.col("tp")) * F.col("tn") - d(F.col("fp")) * F.col("fn")).cast(
        "decimal(38,0)"
    )
    den2 = (d(F.col("tp") + F.col("fp")) * (F.col("tp") + F.col("fn"))).cast(
        "decimal(38,0)"
    ) * (d(F.col("tn") + F.col("fp")) * (F.col("tn") + F.col("fn")))
    nonzero = (
        ((F.col("tp") + F.col("fp")) > 0)
        & ((F.col("tp") + F.col("fn")) > 0)
        & ((F.col("tn") + F.col("fp")) > 0)
        & ((F.col("tn") + F.col("fn")) > 0)
    )
    return conf.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        num.cast("bigint").alias("mcc_num"),
        F.when(
            nonzero, num.cast("double") / F.sqrt(den2.cast("double"))
        ).alias("mcc"),
    )


_N_LABELS = 10


@query(
    "eval_cohens_kappa",
    oracle=f"""
    WITH r0 AS ({_vote_sql_leg(0)}), r1 AS ({_vote_sql_leg(1)}),
    pairs AS (
      SELECT r0.vote AS v0, r1.vote AS v1
      FROM r0 JOIN r1 USING (vec_id)
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(CASE WHEN v0 = v1 THEN 1 END) AS BIGINT) AS agree
      FROM pairs
    ),
    marg AS (
      SELECT CAST(SUM(CAST(n0 AS DECIMAL(19,0)) * n1) AS BIGINT) AS chance
      FROM (SELECT v0 AS c, CAST(COUNT(*) AS BIGINT) AS n0
            FROM pairs GROUP BY v0) a
      JOIN (SELECT v1 AS c, CAST(COUNT(*) AS BIGINT) AS n1
            FROM pairs GROUP BY v1) b USING (c)
    )
    SELECT n, agree,
           CAST(n * agree - chance AS BIGINT) AS kappa_num,
           CAST(n * n - chance AS BIGINT) AS kappa_den,
           CAST(n * agree - chance AS DOUBLE)
             / CAST(n * n - chance AS DOUBLE) AS kappa
    FROM m CROSS JOIN marg
    """,
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between annotators #0 and #1 — see module
    docstring for the exact-fraction clearing.  Scale: one (v0, v1)
    corpus scan reduces to the ≤10-value marginal frames; the chance
    term is a 10-row join; nothing corpus-sized shuffles.  int64
    headroom: n·agree ≤ n² needs n ≤ 3e9 items — beyond that the
    clearing rides DECIMAL(38,0), same algebra."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = emb.select(
        vote_expr(0).alias("v0"), vote_expr(1).alias("v1")
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(F.col("v0") == F.col("v1"), 1))
        .cast("bigint")
        .alias("agree"),
    )
    m0 = pairs.groupBy(F.col("v0").alias("c")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n0")
    )
    m1 = pairs.groupBy(F.col("v1").alias("c")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n1")
    )
    chance = (
        m0.join(m1, "c")
        .agg(
            F.sum(F.col("n0").cast("decimal(19,0)") * F.col("n1"))
            .cast("bigint")
            .alias("chance")
        )
    )
    num = F.col("n") * F.col("agree") - F.col("chance")
    den = F.col("n") * F.col("n") - F.col("chance")
    return m.crossJoin(F.broadcast(chance)).select(
        "n",
        "agree",
        num.cast("bigint").alias("kappa_num"),
        den.cast("bigint").alias("kappa_den"),
        (num.cast("double") / den.cast("double")).alias("kappa"),
    )


@query(
    "eval_ece",
    oracle=f"""
    WITH scored AS (
{CAL_SCORED_SQL}
    ), bins AS (
      SELECT CAST(FLOOR(s_milli / 100) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(CAST(s_milli AS DECIMAL(19,0))) AS BIGINT) AS s_sum
      FROM scored GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(n) AS BIGINT) AS n_examples,
           CAST(SUM(ABS(1000 * n_pos - s_sum)) AS BIGINT) AS ece_num,
           CAST(1000 * SUM(n) AS BIGINT) AS ece_den,
           CAST(SUM(ABS(1000 * n_pos - s_sum)) AS DOUBLE)
             / CAST(1000 * SUM(n) AS DOUBLE) AS ece
    FROM bins
    """,
)
def eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error over the decile bins — see module
    docstring for the exact telescoping (the per-bin n_b cancels, so
    ECE needs NO per-bin float folds: one integer numerator, one
    division).  Scale: corpus → 10-bin aggregate → 1-row fold."""
    scored = cal_scored(load_table(spark, sf_dir, "embeddings"))
    bins = scored.groupBy(
        F.floor(F.col("s_milli") / 100).cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("s_milli").cast("decimal(19,0)"))
        .cast("bigint")
        .alias("s_sum"),
    )
    return bins.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("n").cast("bigint").alias("n_examples"),
        F.sum(F.abs(F.lit(1000) * F.col("n_pos") - F.col("s_sum")))
        .cast("bigint")
        .alias("ece_num"),
        (F.lit(1000) * F.sum("n")).cast("bigint").alias("ece_den"),
        (
            F.sum(F.abs(F.lit(1000) * F.col("n_pos") - F.col("s_sum")))
            .cast("double")
            / (F.lit(1000) * F.sum("n")).cast("double")
        ).alias("ece"),
    )

"""Feature transforms and threshold evals (wave 14).

* `feature_rank_normalize` — percentile (mid-)rank transform of a
  numeric feature: pr(x) = (rank_lo(x) + rank_hi(x)) / (2n), the
  tie-fair quantile normalization used before monotonic models and
  cross-dataset feature fusion.  Exact rational: the numerator
  2*cum_before + cnt + 1 is integer (the eval_auc_rank rank identity),
  n enters once as a double.  The cumulative counts ride the same
  TWO-LEVEL bucketed prefix as eval_auc_rank — the price domain is
  fixed, so the carry-bucket frame is bounded by construction, and the
  per-row transform is a cents-keyed equi-join back to the fact.
* `eval_confusion_threshold` — precision/recall/F1 sweep over fixed
  decision thresholds of the deterministic model score from
  `eval_calibration_bins` (same md5+label synthesis, cited there).
  Counts aggregate per distinct score value first (≤1000 rows), then a
  9-threshold lattice folds suffix sums — TP/FP/FN/TN are BIGINT and
  each metric is ONE double division (F1 via 2TP/(2TP+FP+FN), which
  keeps the denominator integral).

Reference scope note: the reference (vector-client.ts) has no feature
or eval surface; north-star scope alongside eval_auc_rank.

Scale: rank-normalize shuffles the fact ONCE (the cents equi-join);
everything else in both operators happens on aggregate frames
(distinct scores, fixed thresholds, bounded carry buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.numeric import o_dsum
from vector_ai_npm_spark.functions.prefix import cum_before
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.eval_metrics import (
    CAL_SCORED_SQL,
    cal_scored,
)
from vector_ai_npm_spark.registry import query

# integer cents from a 2-decimal double (see eval_metrics._CENTS_SQL for
# why CAST-of-product is engine-divergent)
_PCENTS = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"

_RANK_BUCKET = 1_000_000  # cents per carry bucket (price domain fixed)


@query(
    "feature_rank_normalize",
    oracle=f"""
    WITH fact AS (
      SELECT o_orderkey, {_PCENTS} AS cents FROM orders
    ), by_val AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM fact GROUP BY cents
    ), ranked AS (
      SELECT cents, cnt,
             COALESCE(SUM(cnt) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM by_val
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM fact)
    SELECT f.o_orderkey, f.cents,
           CAST(2 * r.cum_before + r.cnt + 1 AS DOUBLE)
             / (2.0 * CAST(tot.n AS DOUBLE)) AS pct_rank
    FROM fact f JOIN ranked r USING (cents) CROSS JOIN tot
    """,
)
def feature_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-fair percentile-rank normalization of o_totalprice: every
    order gets its mid-rank quantile pr = (2*cum_before + cnt + 1)/(2n)
    — values in (0, 1), equal inputs get equal outputs, and the
    transform is invariant to any monotone rescaling of the raw
    feature.

    Scale: distinct-value aggregate -> two-level prefix (the only
    unpartitioned window runs over the bounded carry-bucket aggregate)
    -> one cents-keyed equi-join back to the fact.  The rank frame is
    value-domain-sized, never corpus-sized."""
    orders = load_table(spark, sf_dir, "orders")
    fact = orders.select(
        "o_orderkey", F.expr(_PCENTS).alias("cents")
    )
    by_val = fact.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    ranked = cum_before(by_val, "cents", "cnt", _RANK_BUCKET).select(
        "cents", "cnt", "cum_before"
    )
    n1 = fact.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        fact.join(ranked, "cents")
        .crossJoin(F.broadcast(n1))
        .select(
            "o_orderkey",
            "cents",
            (
                (F.lit(2) * F.col("cum_before") + F.col("cnt") + F.lit(1))
                .cast("double")
                / (F.lit(2.0) * F.col("n").cast("double"))
            ).alias("pct_rank"),
        )
    )


# the SAME deterministic score synthesis as eval_calibration_bins — one
# model-score fixture shared by the calibration and threshold readouts
_THRESHOLDS = tuple(range(100, 1000, 100))  # milli-units


@query(
    "eval_confusion_threshold",
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
    )
    SELECT CAST(threshold AS BIGINT) AS threshold, tp, fp,
           p_all - tp AS fn, n_all - p_all - fp AS tn,
           CASE WHEN tp + fp > 0 THEN
             CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
           CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE) AS recall,
           CAST(2 * tp AS DOUBLE)
             / CAST(2 * tp + fp + (p_all - tp) AS DOUBLE) AS f1
    FROM lat CROSS JOIN tot
    """,
)
def eval_confusion_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep: TP/FP/FN/TN and precision/recall/F1 at 9
    fixed score thresholds, over the eval_calibration_bins model-score
    fixture.  F1 = 2TP/(2TP+FP+FN) keeps every denominator integral so
    each metric is exactly one IEEE division.

    Scale: corpus reduces to the distinct-score aggregate (≤1000 rows
    by construction of the milli-unit score), the 9-threshold lattice
    folds suffix sums over THAT frame, totals broadcast — corpus scans
    once, nothing corpus-sized shuffles."""
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
            F.explode(
                F.array(*[F.lit(t) for t in _THRESHOLDS])
            ).alias("threshold"),
        )
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when(F.col("s_milli") >= F.col("threshold"), F.col("n_pos"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when(
                    F.col("s_milli") >= F.col("threshold"),
                    F.col("n") - F.col("n_pos"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
        )
    )
    fn = F.col("p_all") - F.col("tp")
    return (
        lat.crossJoin(F.broadcast(tot))
        .select(
            F.col("threshold").cast("bigint").alias("threshold"),
            "tp",
            "fp",
            fn.alias("fn"),
            (F.col("n_all") - F.col("p_all") - F.col("fp")).alias("tn"),
            F.when(
                F.col("tp") + F.col("fp") > 0,
                F.col("tp").cast("double")
                / (F.col("tp") + F.col("fp")).cast("double"),
            ).alias("precision"),
            (F.col("tp").cast("double") / F.col("p_all").cast("double")).alias(
                "recall"
            ),
            (
                (F.lit(2) * F.col("tp")).cast("double")
                / (F.lit(2) * F.col("tp") + F.col("fp") + fn).cast("double")
            ).alias("f1"),
        )
    )


# --------------------------------------------------------------------------
# eval_calibration_isotonic
# --------------------------------------------------------------------------
#
# Isotonic (PAV) calibration of the binned rates, via the minimax
# characterization of isotonic regression: the fitted value at bin i is
#
#     iso_i = max_{j<=i} min_{k>=i} avg(p over bins j..k)
#
# (Barlow et al. 1972, "Statistical Inference under Order
# Restrictions") — equivalent to pool-adjacent-violators but expressible
# as pure joins/aggregates over the BIN frame, so both engines compute
# it without any sequential pooling loop.  Every interval average is an
# exact-integer ratio evaluated as ONE double division; equal rationals
# produce identical doubles (correct rounding of the same real), so the
# min/max selections agree bit-for-bit across engines.
#
# Scale: the corpus reduces to the <=10-row bin frame first (the
# eval_calibration_bins aggregate); the (j,k,i) lattice is 10^3 rows of
# broadcast NLJ — constant-size at any corpus scale.


@query(
    "eval_calibration_isotonic",
    oracle=f"""
    WITH scored AS (
{CAL_SCORED_SQL}
    ), bins AS (
      SELECT CAST(FLOOR(s_milli / 100) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS p
      FROM scored GROUP BY CAST(FLOOR(s_milli / 100) AS BIGINT)
    ), cum AS (
      SELECT bin, n, p,
             CAST(SUM(n) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cn,
             CAST(SUM(p) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cp
      FROM bins
    ), pairs AS (
      SELECT j.bin AS jb, k.bin AS kb,
             CAST(k.cp - (j.cp - j.p) AS DOUBLE)
               / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS avg_jk
      FROM cum j JOIN cum k ON j.bin <= k.bin
    ), inner_min AS (
      SELECT i.bin, p2.jb, MIN(p2.avg_jk) AS m
      FROM bins i JOIN pairs p2 ON p2.jb <= i.bin AND p2.kb >= i.bin
      GROUP BY i.bin, p2.jb
    )
    SELECT b.bin, b.n AS n_examples,
           CAST(b.p AS DOUBLE) / CAST(b.n AS DOUBLE) AS frac_pos,
           mx.iso AS iso_rate
    FROM bins b JOIN (
      SELECT bin, MAX(m) AS iso FROM inner_min GROUP BY bin
    ) mx USING (bin)
    """,
)
def eval_calibration_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration curve over the shared score fixture: raw
    per-bin positive rates plus their PAV (monotone non-decreasing)
    fit, computed by the minimax identity over the bin frame — see the
    block comment for the formulation and scale shapes."""
    scored = cal_scored(load_table(spark, sf_dir, "embeddings"))
    bins = scored.groupBy(
        F.floor(F.col("s_milli") / F.lit(100)).cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("p"),
    )
    w_cum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    cum = bins.select(
        "bin",
        "n",
        "p",
        F.sum("n").over(w_cum).cast("bigint").alias("cn"),
        F.sum("p").over(w_cum).cast("bigint").alias("cp"),
    )
    j = cum.select(
        F.col("bin").alias("jb"),
        (F.col("cp") - F.col("p")).alias("cp_before"),
        (F.col("cn") - F.col("n")).alias("cn_before"),
    )
    k = cum.select(
        F.col("bin").alias("kb"), F.col("cp").alias("cpk"),
        F.col("cn").alias("cnk"),
    )
    pairs = j.join(F.broadcast(k), F.col("jb") <= F.col("kb")).select(
        "jb",
        "kb",
        (
            (F.col("cpk") - F.col("cp_before")).cast("double")
            / (F.col("cnk") - F.col("cn_before")).cast("double")
        ).alias("avg_jk"),
    )
    i_frame = bins.select(F.col("bin").alias("ib"))
    inner_min = (
        i_frame.join(
            F.broadcast(pairs),
            (F.col("jb") <= F.col("ib")) & (F.col("kb") >= F.col("ib")),
        )
        .groupBy("ib", "jb")
        .agg(F.min("avg_jk").alias("m"))
    )
    iso = inner_min.groupBy("ib").agg(F.max("m").alias("iso_rate"))
    return bins.join(
        F.broadcast(iso), bins.bin == iso.ib
    ).select(
        "bin",
        F.col("n").alias("n_examples"),
        (F.col("p").cast("double") / F.col("n").cast("double")).alias(
            "frac_pos"
        ),
        "iso_rate",
    )


# --------------------------------------------------------------------------
# eval_average_precision
# --------------------------------------------------------------------------


@query(
    "eval_average_precision",
    oracle=f"""
    WITH scored AS (
{CAL_SCORED_SQL}
    ), by_score AS (
      SELECT s_milli, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS n_pos
      FROM scored GROUP BY s_milli
    ), cum AS (
      SELECT s_milli, n, n_pos,
             CAST(SUM(n) OVER (ORDER BY s_milli DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS c_all,
             CAST(SUM(n_pos) OVER (ORDER BY s_milli DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS c_pos
      FROM by_score
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_all,
             CAST(SUM(n_pos) AS BIGINT) AS p_all
      FROM by_score
    )
    SELECT tot.n_all AS n_examples, tot.p_all AS n_pos,
           CAST(tot.p_all AS DOUBLE) / CAST(tot.n_all AS DOUBLE)
             AS prevalence,
           {o_dsum("CAST(c.n_pos AS DOUBLE)"
                   " * (CAST(c.c_pos AS DOUBLE) / CAST(c.c_all AS DOUBLE))")}
             / CAST(tot.p_all AS DOUBLE) AS average_precision
    FROM cum c CROSS JOIN tot
    GROUP BY tot.n_all, tot.p_all
    """,
)
def eval_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (AUPRC, step interpolation — the
    sklearn/TREC definition): AP = sum over distinct score thresholds
    (descending) of (delta recall) * (precision at the threshold),
    where both factors are exact-integer ratios from the cumulative
    counts.  Completes the threshold-free eval pair next to
    `eval_auc_rank` — AP is the one that stays informative under heavy
    class imbalance.  Per-threshold terms are identical double chains;
    the sum over thresholds folds through exact decimal (dsum) so the
    score-domain order never matters.

    Scale: the corpus reduces to the ≤1000-row distinct-score frame
    (milli-unit score domain — fixed by construction) before the only
    window; one 1-row fold."""
    from vector_ai_npm_spark.functions.numeric import dsum

    scored = cal_scored(load_table(spark, sf_dir, "embeddings"))
    by_score = scored.groupBy("s_milli").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    w_cum = W.orderBy(F.desc("s_milli")).rowsBetween(W.unboundedPreceding, 0)
    cum = by_score.select(
        "n_pos",
        F.sum("n").over(w_cum).cast("bigint").alias("c_all"),
        F.sum("n_pos").over(w_cum).cast("bigint").alias("c_pos"),
    )
    tot = by_score.agg(
        F.sum("n").cast("bigint").alias("n_all"),
        F.sum("n_pos").cast("bigint").alias("p_all"),
    )
    # fold n_pos * precision (magnitude ~1) and divide by P once at the
    # end: folding the fully-normalized term would sit at ~1e-3 where
    # dsum's scale-8 quantization costs 4 significant digits
    term = F.col("n_pos").cast("double") * (
        F.col("c_pos").cast("double") / F.col("c_all").cast("double")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_all", "p_all")
        .agg(dsum(term, "ap_num"))
        .select(
            F.col("n_all").alias("n_examples"),
            F.col("p_all").alias("n_pos"),
            (
                F.col("p_all").cast("double") / F.col("n_all").cast("double")
            ).alias("prevalence"),
            (F.col("ap_num") / F.col("p_all").cast("double")).alias(
                "average_precision"
            ),
        )
    )


# --------------------------------------------------------------------------
# eval_brier_score
# --------------------------------------------------------------------------

# varchar-bridged decimal->double for the squared-error fold (the
# o_dsum rationale, functions/numeric.py)
_O_D2D_SE = "CAST(CAST(se_milli2 AS VARCHAR) AS DOUBLE)"


@query(
    "eval_brier_score",
    oracle=f"""
    WITH scored AS (
{CAL_SCORED_SQL}
    ), folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(s_milli - 1000 * pos AS DECIMAL(19,0))
                      * CAST(s_milli - 1000 * pos AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS se_milli2,
             CAST(SUM(pos) AS BIGINT) AS n_pos
      FROM scored
    )
    SELECT n AS n_examples, n_pos,
           {_O_D2D_SE} / CAST(n AS DOUBLE) / 1000000.0
             AS brier_score,
           (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
             * (1.0 - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
             AS brier_baseline
    FROM folded
    """,
)
def eval_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of the shared model-score fixture: mean squared
    error between predicted probability and outcome.  With milli-unit
    integer scores the per-row residual (s_milli - 1000*y) is INTEGER,
    so the sum of squares folds exactly as DECIMAL(19,0)^2 -> (38,0)
    and the score is two divisions at the end (/n, /1e6 back to
    probability units).  `brier_baseline` = prevalence*(1-prevalence)
    is the no-skill reference (predicting the base rate everywhere);
    a useful model sits below it.

    Scale: map-only residuals + a 1-row integer fold — pure scan
    cost."""
    scored = cal_scored(load_table(spark, sf_dir, "embeddings"))
    d19 = "decimal(19,0)"
    resid = (F.col("s_milli") - F.lit(1000) * F.col("pos")).cast(d19)
    folded = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(resid * resid).cast("decimal(38,0)").alias("se_milli2"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    prev = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return folded.select(
        F.col("n").alias("n_examples"),
        "n_pos",
        (
            F.col("se_milli2").cast("double")
            / F.col("n").cast("double")
            / F.lit(1000000.0)
        ).alias("brier_score"),
        (prev * (F.lit(1.0) - prev)).alias("brier_baseline"),
    )

"""CUPED variance-reduced experiment readout (wave 12).

CUPED (Deng, Xu, Kohavi & Walker, WSDM 2013 — "Improving the
Sensitivity of Online Controlled Experiments by Utilizing Pre-
Experiment Data"): the industry-standard variance-reduction trick.
Each user's post-period metric Y is adjusted by their PRE-period
covariate X:

    Y' = Y − θ·(X − mean(X)),   θ = cov(X, Y) / var(X)

Var(Y') = Var(Y)·(1 − ρ²), so a strongly auto-correlated metric (spend
usually is) needs far fewer users for the same power; the arm-mean
DIFFERENCE is unbiased because mean(X) is arm-independent under
randomization.  This face extends `ab_test_summary`
(operators/experiment_ops.py): same deterministic md5 arm assignment,
same exact-sufficient-statistics discipline (no erf/ln — downstream
tools compute p-values from the reported moments).

Cross-engine determinism (round-7 review hardening): the x·x / x·y
moment folds do NOT ride the double→decimal bridge at all — per-user
sums stay DECIMAL(18,4), so their products are EXACT DECIMAL(37,8)
values (no precision clamp in either engine: Spark p1+p2+1 = 37 ≤ 38,
DuckDB p1+p2 = 36 ≤ 38) and every moment is exact decimal arithmetic
end-to-end, cast to double exactly once for θ.  The only
double→decimal hop left is the original per-EVENT value cast, whose
~1e9-summand identity bound (functions/numeric.py) applies to single
purchase amounts, not user aggregates — a first pre-scale-by-2⁻¹⁰
design kept the fold in doubles and measurably diverged at the 9th
digit (binary-exact scaling is not decimal-string-exact).  Bounds:
|event value| ≤ 1e9 for identical decimal casts; per-user sums < 1e14
(DECIMAL(18,4)) — document-checked, far above any real spend.
θ and the adjusted means are then IDENTICAL double expression chains
in both engines (the events_trend_ols recipe), so the face is
hash-checkable despite being float-valued.

Scale: one (user)-keyed aggregate over events (conditional sums split
pre/post in the same pass), a broadcast 1-row pooled-moment frame, and
a 2-row arm rollup.  Nothing corpus-scale shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.experiment_ops import (
    _DUCK_ARM,
    _SPARK_ARM,
)
from vector_ai_npm_spark.registry import query

_SPLIT = "2024-01-16"  # pre-period: Jan 1-15; post: Jan 16-30

_D = "DECIMAL(18,4)"


def _o_dec2dbl(expr: str) -> str:
    """DuckDB decimal→double through VARCHAR (exact; see o_dsum)."""
    return f"CAST(CAST(({expr}) AS VARCHAR) AS DOUBLE)"


@query(
    "ab_cuped_adjust",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, {_DUCK_ARM} AS arm,
             CAST(SUM(CAST(CASE WHEN event_type = 'purchase' AND
                  ts < TIMESTAMP '{_SPLIT}' THEN value ELSE 0 END
                  AS {_D})) AS {_D}) AS xd,
             CAST(SUM(CAST(CASE WHEN event_type = 'purchase' AND
                  ts >= TIMESTAMP '{_SPLIT}' THEN value ELSE 0 END
                  AS {_D})) AS {_D}) AS yd
      FROM events GROUP BY user_id
    ), pooled AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             {_o_dec2dbl('SUM(xd)')} AS sx,
             {_o_dec2dbl('SUM(yd)')} AS sy,
             {_o_dec2dbl('SUM(xd * xd)')} AS sxx,
             {_o_dec2dbl('SUM(xd * yd)')} AS sxy
      FROM per_user
    ), theta AS (
      SELECT n, sx,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS th
      FROM pooled
    )
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           {_o_dec2dbl('SUM(yd)')} / CAST(COUNT(*) AS DOUBLE) AS mean_y,
           ({_o_dec2dbl('SUM(yd)')} / CAST(COUNT(*) AS DOUBLE))
             - theta.th * (({_o_dec2dbl('SUM(xd)')}
                            / CAST(COUNT(*) AS DOUBLE))
                           - (theta.sx / theta.n)) AS mean_y_cuped
    FROM per_user CROSS JOIN theta
    GROUP BY arm, theta.th, theta.sx, theta.n
    """,
)
def ab_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm post-period purchase mean, raw and CUPED-adjusted — see
    module docstring for the estimator and determinism argument."""
    ev = load_table(spark, sf_dir, "events")
    pre = (F.col("event_type") == "purchase") & (
        F.col("ts") < F.lit(_SPLIT).cast("timestamp")
    )
    post = (F.col("event_type") == "purchase") & (
        F.col("ts") >= F.lit(_SPLIT).cast("timestamp")
    )
    dec = _D.lower()
    per_user = ev.groupBy("user_id").agg(
        F.first(F.expr(_SPARK_ARM)).alias("arm"),
        F.sum(F.when(pre, F.col("value")).otherwise(F.lit(0.0)).cast(dec))
        .cast(dec)
        .alias("xd"),
        F.sum(F.when(post, F.col("value")).otherwise(F.lit(0.0)).cast(dec))
        .cast(dec)
        .alias("yd"),
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("xd").cast("double").alias("sx"),
        F.sum("yd").cast("double").alias("sy"),
        F.sum(F.col("xd") * F.col("xd")).cast("double").alias("sxx"),
        F.sum(F.col("xd") * F.col("yd")).cast("double").alias("sxy"),
    )
    theta = pooled.select(
        "n",
        "sx",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("th"),
    )
    arms = (
        per_user.join(F.broadcast(theta), how="cross")
        .groupBy("arm", "th", "sx", "n")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("yd").cast("double").alias("sy_a"),
            F.sum("xd").cast("double").alias("sx_a"),
        )
    )
    mean_y = F.col("sy_a") / F.col("n_users").cast("double")
    return arms.select(
        "arm",
        "n_users",
        mean_y.alias("mean_y"),
        (
            mean_y
            - F.col("th")
            * (
                (F.col("sx_a") / F.col("n_users").cast("double"))
                - (F.col("sx") / F.col("n"))
            )
        ).alias("mean_y_cuped"),
    )

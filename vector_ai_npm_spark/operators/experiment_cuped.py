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

Cross-engine determinism: every per-user sum and every cross-user
moment folds through exact decimal (functions.numeric dsum); θ and the
adjusted means are then IDENTICAL double expression chains in both
engines (the events_trend_ols recipe), so the face is hash-checkable
despite being float-valued.

Scale: one (user)-keyed aggregate over events (conditional sums split
pre/post in the same pass), a broadcast 1-row pooled-moment frame, and
a 2-row arm rollup.  Nothing corpus-scale shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.numeric import dsum, o_dsum
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.experiment_ops import (
    _DUCK_ARM,
    _SPARK_ARM,
)
from vector_ai_npm_spark.registry import query

_SPLIT = "2024-01-16"  # pre-period: Jan 1-15; post: Jan 16-30


@query(
    "ab_cuped_adjust",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, {_DUCK_ARM} AS arm,
             {o_dsum("CASE WHEN event_type = 'purchase' AND "
                     f"ts < TIMESTAMP '{_SPLIT}' THEN value ELSE 0 END")} AS x,
             {o_dsum("CASE WHEN event_type = 'purchase' AND "
                     f"ts >= TIMESTAMP '{_SPLIT}' THEN value ELSE 0 END")} AS y
      FROM events GROUP BY user_id
    ), pooled AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             {o_dsum('x')} AS sx, {o_dsum('y')} AS sy,
             {o_dsum('x * x')} AS sxx, {o_dsum('x * y')} AS sxy
      FROM per_user
    ), theta AS (
      SELECT n, sx,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS th
      FROM pooled
    )
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           {o_dsum('y')} / CAST(COUNT(*) AS DOUBLE) AS mean_y,
           ({o_dsum('y')} / CAST(COUNT(*) AS DOUBLE))
             - theta.th * (({o_dsum('x')} / CAST(COUNT(*) AS DOUBLE))
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
    per_user = ev.groupBy("user_id").agg(
        F.first(F.expr(_SPARK_ARM)).alias("arm"),
        dsum(F.when(pre, F.col("value")).otherwise(F.lit(0.0)), "x"),
        dsum(F.when(post, F.col("value")).otherwise(F.lit(0.0)), "y"),
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("x", "sx"),
        dsum("y", "sy"),
        dsum(F.col("x") * F.col("x"), "sxx"),
        dsum(F.col("x") * F.col("y"), "sxy"),
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
            dsum("y", "sy_a"),
            dsum("x", "sx_a"),
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

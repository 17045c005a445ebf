"""Spearman rank correlation (wave 19).

`eval_spearman_corr` — the monotone-association readout between two
per-user behavioral metrics (total spend vs event count): the
feature-redundancy screen `agg_corr_matrix` runs in Pearson form, done
rank-wise so outliers and nonlinearity don't fake or mask association
— the pair every feature-selection pass computes side by side.

Exactness: Spearman = Pearson over midranks.  With ties, midranks are
half-integers, so DOUBLED midranks R = 2·cum_before + cnt + 1 are
exact integers (the `eval_auc_rank` tie-corrected rank identity), and
the Pearson power sums over (Rx, Ry) are exact DECIMAL(38,0) folds:

    rho = (n·ΣRxRy − ΣRx·ΣRy)
          / (sqrt(n·ΣRx² − (ΣRx)²) · sqrt(n·ΣRy² − (ΣRy)²))

— two correctly-rounded sqrts of exact integers, one identical double
chain.  The factor-of-2 scaling cancels.

Scale: one user-keyed aggregate reduces the corpus; each metric's
midranks come from its distinct-value frame (two small aggregates +
cents-keyed equi-joins back — the `feature_rank_normalize` shape); the
power-sum fold is one 1-row aggregate.  No corpus-scale windows: the
rank prefix runs on the distinct-value frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.prefix import cum_before
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_CENTS_SQL = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"

_RANK_BUCKET = 10_000  # key-range width per prefix carry bucket


@query(
    "eval_spearman_corr",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM({_CENTS_SQL}) AS BIGINT) AS spend,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ),
    rx AS (
      SELECT spend AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
             COALESCE(SUM(COUNT(*)) OVER (ORDER BY spend
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cb
      FROM per_user GROUP BY spend
    ),
    ry AS (
      SELECT n_events AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
             COALESCE(SUM(COUNT(*)) OVER (ORDER BY n_events
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cb
      FROM per_user GROUP BY n_events
    ),
    ranked AS (
      SELECT CAST(2 * rx.cb + rx.cnt + 1 AS BIGINT) AS r_x,
             CAST(2 * ry.cb + ry.cnt + 1 AS BIGINT) AS r_y
      FROM per_user u
      JOIN rx ON rx.v = u.spend
      JOIN ry ON ry.v = u.n_events
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r_x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(r_y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(r_x AS DECIMAL(19,0)) * r_x) AS DECIMAL(38,0))
               AS sxx,
             CAST(SUM(CAST(r_y AS DECIMAL(19,0)) * r_y) AS DECIMAL(38,0))
               AS syy,
             CAST(SUM(CAST(r_x AS DECIMAL(19,0)) * r_y) AS DECIMAL(38,0))
               AS sxy
      FROM ranked
    )
    SELECT n,
           CAST(CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / (SQRT(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
                * SQRT(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)))
             AS DOUBLE) AS spearman_rho
    FROM sums
    """,
)
def eval_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho between per-user spend and event count — see
    module docstring.  (DuckDB decimal→double hops ride the varchar
    bridge, functions/numeric.py's o_dsum rationale.)"""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5))
        .cast("bigint")
        .alias("spend"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )

    def midranks(col: str) -> DataFrame:
        # distinct-value frame; prefix via the TWO-LEVEL bucketed
        # decomposition (cents-valued spend can be near-unique per
        # user, so this frame is user-scale at 100 TB — never a
        # single-task unpartitioned window)
        by_v = per_user.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        cb = cum_before(by_v, "v", "cnt", _RANK_BUCKET)
        return cb.select(
            "v",
            (
                F.lit(2) * F.col("cum_before") + F.col("cnt") + 1
            )
            .cast("bigint")
            .alias(f"r_{col}"),
        )
    ranked = (
        per_user.join(
            midranks("spend").withColumnRenamed("v", "spend"), "spend"
        )
        .join(
            midranks("n_events").withColumnRenamed("v", "n_events"),
            "n_events",
        )
        .select(
            F.col("r_spend").alias("r_x"),
            F.col("r_n_events").alias("r_y"),
        )
    )
    d19 = "decimal(19,0)"
    sums = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r_x").cast("decimal(38,0)").alias("sx"),
        F.sum("r_y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("r_x").cast(d19) * F.col("r_x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("r_y").cast(d19) * F.col("r_y"))
        .cast("decimal(38,0)")
        .alias("syy"),
        F.sum(F.col("r_x").cast(d19) * F.col("r_y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return sums.select(
        "n",
        (num / (F.sqrt(vx) * F.sqrt(vy))).alias("spearman_rho"),
    )

"""Wave 30: group-fairness AUC gap.

`eval_fairness_auc_gap` — the fairness slice the eval suite was
missing: the SAME exact tie-corrected Mann-Whitney AUC as
`eval_auc_rank`, computed per demographic group (deterministic md5
split of users — the fixture convention standing in for a real
protected attribute), plus the absolute AUC gap between groups.  A
model can clear the aggregate-AUC bar while ranking one group's
positives far worse; the gap is the readout fairness reviews gate on
(equality of opportunity's ranking analogue).

Exactness: each group's rank sum is the eval_auc_rank integer
identity (2S = Σ cnt_pos·(2·cum_before + cnt + 1)) over that group's
OWN distinct-score frame, cumulative counts from the shared two-level
prefix (per-group frames stay score-range-bucketed — no
partition-by-constant corpus window); both AUCs and the gap are
identical double expressions over DECIMAL(38,0) folds, decimal →
double via the varchar bridge on the DuckDB side.

Scale shape: one user-keyed aggregate (group + score + label ride the
same shuffle), then per-group distinct-score frames; everything after
is score-domain-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.prefix import cum_before
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.eval_metrics import (
    _AUC_BUCKET,
    _CENTS_SQL,
    _duck_hash_mod,
    _o_d2d,
    _spark_hash_mod,
)
from vector_ai_npm_spark.registry import query

_D19 = "decimal(19,0)"


def _duck_leg(g: int) -> str:
    return f"""
    per_user_{g} AS (
      SELECT CAST(SUM({_CENTS_SQL}) AS BIGINT) AS cents,
             CASE WHEN CAST(COUNT(CASE WHEN event_type = 'purchase'
                                       THEN 1 END) AS BIGINT) * 5
                       > CAST(COUNT(*) AS BIGINT)
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS pos
      FROM events
      GROUP BY user_id
      HAVING {_duck_hash_mod("user_id", "#grp", 2)} = {g}
    ), by_score_{g} AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(pos) AS BIGINT) AS cnt_pos
      FROM per_user_{g} GROUP BY cents
    ), ranked_{g} AS (
      SELECT cnt, cnt_pos,
             COALESCE(SUM(cnt) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM by_score_{g}
    ), folded_{g} AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n_users,
             CAST(SUM(cnt_pos) AS BIGINT) AS n_pos,
             CAST(SUM(cnt - cnt_pos) AS BIGINT) AS n_neg,
             CAST(SUM(CAST(cnt_pos AS DECIMAL(19,0))
                      * CAST(2 * cum_before + cnt + 1 AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS s2_pos
      FROM ranked_{g}
    )"""


def _duck_auc(g: int) -> str:
    return (
        f"""({_o_d2d(f"(SELECT s2_pos FROM folded_{g})"
                     f" - CAST((SELECT n_pos FROM folded_{g}) AS DECIMAL(19,0))"
                     f" * CAST((SELECT n_pos FROM folded_{g}) + 1 AS DECIMAL(19,0))")}"""
        f" / (2.0 * CAST((SELECT n_pos FROM folded_{g}) AS DOUBLE)"
        f" * CAST((SELECT n_neg FROM folded_{g}) AS DOUBLE)))"
    )


@query(
    "eval_fairness_auc_gap",
    oracle=f"""
    WITH {_duck_leg(0)}, {_duck_leg(1)}
    SELECT (SELECT n_users FROM folded_0) AS n_a,
           (SELECT n_pos FROM folded_0) AS pos_a,
           {_duck_auc(0)} AS auc_a,
           (SELECT n_users FROM folded_1) AS n_b,
           (SELECT n_pos FROM folded_1) AS pos_b,
           {_duck_auc(1)} AS auc_b,
           ABS({_duck_auc(0)} - {_duck_auc(1)}) AS auc_gap
    """,
)
def eval_fairness_auc_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact AUC + gap — see module docstring."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.expr(_CENTS_SQL)).cast("bigint").alias("cents"),
        F.when(
            F.count(F.when(F.col("event_type") == "purchase", 1)).cast(
                "bigint"
            )
            * 5
            > F.count(F.lit(1)).cast("bigint"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("pos"),
    ).withColumn("grp", _spark_hash_mod(F.col("user_id"), "#grp", 2))

    def _fold(g: int) -> DataFrame:
        by_score = (
            per_user.where(F.col("grp") == g)
            .groupBy("cents")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.sum("pos").cast("bigint").alias("cnt_pos"),
            )
        )
        ranked = cum_before(by_score, "cents", "cnt", _AUC_BUCKET)
        return ranked.agg(
            F.sum("cnt").cast("bigint").alias(f"n_{g}"),
            F.sum("cnt_pos").cast("bigint").alias(f"pos_{g}"),
            F.sum(F.col("cnt") - F.col("cnt_pos"))
            .cast("bigint")
            .alias(f"neg_{g}"),
            F.sum(
                F.col("cnt_pos").cast(_D19)
                * (
                    F.lit(2) * F.col("cum_before") + F.col("cnt") + F.lit(1)
                ).cast(_D19)
            )
            .cast("decimal(38,0)")
            .alias(f"s2_{g}"),
        )

    both = _fold(0).crossJoin(F.broadcast(_fold(1)))

    def _auc(g: int):
        u2 = (
            F.col(f"s2_{g}")
            - F.col(f"pos_{g}").cast(_D19)
            * (F.col(f"pos_{g}") + F.lit(1)).cast(_D19)
        ).cast("double")
        return u2 / (
            F.lit(2.0)
            * F.col(f"pos_{g}").cast("double")
            * F.col(f"neg_{g}").cast("double")
        )

    return both.select(
        F.col("n_0").alias("n_a"),
        F.col("pos_0").alias("pos_a"),
        _auc(0).alias("auc_a"),
        F.col("n_1").alias("n_b"),
        F.col("pos_1").alias("pos_b"),
        _auc(1).alias("auc_b"),
        F.abs(_auc(0) - _auc(1)).alias("auc_gap"),
    )

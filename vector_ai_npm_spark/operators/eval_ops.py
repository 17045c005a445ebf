"""Model-evaluation metrics (wave 4): the unbiased pass@k estimator.

`eval_pass_at_k` — the standard code/reasoning eval readout (Chen et
al. 2021, Codex §2.1): a task with n sampled attempts and c successes
contributes pass@k = 1 − C(n−c,k)/C(n,k), the unbiased estimator of
P(≥1 success in k draws without replacement); the corpus metric is the
mean over tasks with n ≥ k attempts.  The fixture maps tasks→users and
success→purchase events, so the estimator runs over the events table;
in production the (task_id, attempt, passed) frame swaps in, same
shapes.  Reference scope note: the reference has no eval surface; this
extends the retrieval_eval_ndcg evaluation family.

Cross-engine determinism: C(n−c,k)/C(n,k) collapses to the k-factor
product Π(n−c−i)/Π(n−i).  Both engines evaluate the SAME left-to-right
double multiply chain and one final division — every step correctly
rounded IEEE, so the bits agree without any decimal routing (the
ab_test_summary conversion_rate argument, applied factor-wise); the
mean over tasks folds through exact decimal (dsum) to stay
partition-order-free.

Scale: one user-keyed aggregate (n, c per task), a 2-value k lattice
exploded per task row, and a 2-row final rollup — nothing wider than
the per-task frame ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.numeric import dsum, o_dsum
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_KS = (1, 5)


def _prod(base: str, k: int) -> str:
    """Left-to-right k-factor double product Π_{i<k}(base − i) — the
    identical expression string runs in Spark SQL and DuckDB."""
    return " * ".join(f"CAST({base} - {i} AS DOUBLE)" for i in range(k))


def _pass_k_case(k_col: str) -> str:
    """pass@k as a CASE over the k lattice (n, c are BIGINT columns)."""
    whens = " ".join(
        f"WHEN {k} THEN CASE WHEN n - c < {k} THEN CAST(1.0 AS DOUBLE) "
        f"ELSE CAST(1.0 AS DOUBLE) - ({_prod('n - c', k)}) / ({_prod('n', k)}) END"
        for k in _KS
    )
    return f"CASE {k_col} {whens} END"


@query(
    "eval_pass_at_k",
    oracle=f"""
    WITH per_task AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS c
      FROM events GROUP BY user_id
    ),
    lat AS (
      SELECT t.user_id, t.n, t.c, CAST(ks.k AS BIGINT) AS k,
             {_pass_k_case('ks.k')} AS pass_k
      FROM per_task t CROSS JOIN (VALUES (1), (5)) AS ks(k)
      WHERE t.n >= ks.k
    )
    SELECT k,
           CAST(COUNT(*) AS BIGINT) AS n_tasks,
           {o_dsum('pass_k')} / CAST(COUNT(*) AS DOUBLE) AS mean_pass_at_k
    FROM lat GROUP BY k
    """,
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k over (task=user, success=purchase) — see module
    docstring.  One task aggregate, a per-row k lattice, a 2-row
    rollup."""
    ev = load_table(spark, sf_dir, "events")
    per_task = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c"),
    )
    lat = (
        per_task.select(
            "n",
            "c",
            F.explode(
                F.array(*[F.lit(k).cast("long") for k in _KS])
            ).alias("k"),
        )
        .where(F.col("n") >= F.col("k"))
        .withColumn("pass_k", F.expr(_pass_k_case("k")))
    )
    return lat.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_tasks"),
        (dsum("pass_k") / F.count(F.lit(1)).cast("double")).alias(
            "mean_pass_at_k"
        ),
    )

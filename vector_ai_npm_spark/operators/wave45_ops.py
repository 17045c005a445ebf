"""Wave 45 (round 10): exact Kendall τ opt-in face.

`eval_kendall_tau_exact` — the UNSAMPLED Kendall τ_a/τ_b pieces over
the full embeddings corpus.  The default face (`eval_kendall_tau`,
operators/wave33_ops.py) computes τ on a fixed md5 top-2000 sample —
the right 100 TB estimator, but a silently different ESTIMAND from the
textbook statistic.  This face restores the exact statistic for small
corpora; above `_EXACT_SUBSET_CAP` (20k rows, r12) the estimand is the
exact τ_a of the deterministic md5-top-20k subset — bounded, stable
across engines, and documented rather than a refusal (the
`mine_bitext_margin` bounded-subset precedent).  Unbounded, the
histogram-pair join grows quadratically until the score domain
saturates (measured 9.6× wall at the 10× replica before the cap —
round-9 scale study, TUNING.md).

At fixture scales (500 / 2000 rows) the cap is a no-op, so the oracle
parity gate checks the truly exact full-corpus statistic end-to-end.

Cross-engine determinism: integer hash scores, integer pair tallies,
one final double division spelled identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.eval_metrics import (
    _duck_hash_mod,
    _spark_hash_mod,
)
from vector_ai_npm_spark.registry import query

# r12 (sf10 catch, the mine_bitext_margin bounded-subset precedent):
# above this row count the face computes the exact statistic on the
# deterministic md5-top-N subset instead of refusing — the histogram's
# distinct (x,y) cells keep growing until the 1200×1200 score domain
# saturates, and the non-equi cell-pair join is quadratic in cells
# (93k cells at 100k rows = 4.3e9 pair tests in BOTH engines).  20k
# keeps the full corpus through sf1 (bit-identical results at
# sf0.01/0.1/1) and caps the pair join at ~2e8 above it.  The SAME
# bound is in the oracle SQL, so both engines score the same subset.
_EXACT_SUBSET_CAP = 20_000


@query(
    "eval_kendall_tau_exact",
    oracle=f"""
    WITH sub AS (
      SELECT vec_id, label FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
      LIMIT {_EXACT_SUBSET_CAP}
    ), scored AS (
      SELECT {_duck_hash_mod("vec_id", "#cal", 600)}
               + CASE WHEN label < 5 THEN 350 ELSE 50 END AS x,
             {_duck_hash_mod("vec_id", "#kt2", 600)}
               + CASE WHEN label < 5 THEN 300 ELSE 100 END AS y
      FROM sub
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
def eval_kendall_tau_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kendall τ_a — full-corpus through 20k rows, the exact
    statistic of the deterministic md5-top-`_EXACT_SUBSET_CAP` subset
    above that (bounded estimand, module docstring).  A no-op cap at
    every fixture scale, so the parity gate checks the unsampled
    statistic end-to-end."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        # deterministic md5-top-N subset: a no-op through sf1, the
        # bounded exact estimand above it (see _EXACT_SUBSET_CAP)
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(_EXACT_SUBSET_CAP)
    )
    scored = emb.select(
        (
            _spark_hash_mod(F.col("vec_id"), "#cal", 600)
            + F.when(F.col("label") < 5, 350).otherwise(50)
        ).alias("x"),
        (
            _spark_hash_mod(F.col("vec_id"), "#kt2", 600)
            + F.when(F.col("label") < 5, 300).otherwise(100)
        ).alias("y"),
    )
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

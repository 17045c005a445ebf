"""Per-group z-score standardization (wave 17).

`feature_standardize` — the feature-store transform every numeric
feature passes through before training: z = (x − μ_g)/σ_g per group
(event_type here), with the group moments computed once and broadcast
back over the fact.  Complements `feature_rank_normalize` (rank-based)
with the parametric scaling.

Cross-engine determinism: value has 2 decimals, so cents are exact
integers; clearing denominators gives

    z = (c·n − S) · sqrt(n·(n−1)) / (n · sqrt(n·Σc² − S²))

where S = Σc and every radicand is an exact integer (n·Σc² − S² =
n²·(n−1)·Var_cents ≥ 0).  sqrt is IEEE-correctly-rounded in both
engines and the multiplication chain is written identically, so every
z is bit-deterministic.  int64 headroom: n·Σc² needs n²·c̄² ≲ 9.2e18 —
~3e9 cent-scale rows per group; the DECIMAL(38,0) intermediates below
carry it further.

Scale shape: one group aggregate (|event_type| rows) broadcast back
over one fact scan — the fact never shuffles; output is corpus-sized
by design (a per-row feature)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_CENTS_SQL = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"


@query(
    "feature_standardize",
    oracle=f"""
    WITH f AS (
      SELECT event_id, event_type, {_CENTS_SQL} AS c FROM events
    ),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(CAST(c AS DECIMAL(19,0)) * c) AS BIGINT) AS s2
      FROM f GROUP BY event_type
    )
    SELECT f.event_id, f.event_type, f.c AS cents,
           CAST(f.c * g.n - g.s AS BIGINT) AS z_num_scaled,
           CASE WHEN g.n > 1
                 AND CAST(g.n AS DECIMAL(38,0)) * g.s2
                     > CAST(g.s AS DECIMAL(38,0)) * g.s THEN
             (CAST(f.c * g.n - g.s AS DOUBLE)
              * SQRT(CAST(g.n * (g.n - 1) AS DOUBLE)))
             / (CAST(g.n AS DOUBLE)
                * SQRT(CAST(CAST(CAST(g.n AS DECIMAL(38,0)) * g.s2
                       - CAST(g.s AS DECIMAL(38,0)) * g.s
                       AS VARCHAR) AS DOUBLE)))
           END AS z
    FROM f JOIN g USING (event_type)
    """,
)
def feature_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type z-score of value — see module docstring for the
    exact-integer clearing.  Degenerate groups (n ≤ 1 or zero
    variance) yield NULL rather than ±inf."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("c"),
    )
    g = f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("c"))
        .cast("bigint")
        .alias("s2"),
    )
    num = F.col("c") * F.col("n") - F.col("s")
    # the variance radicand n·Σc² − S² overflows int64 once n·c̄²
    # crosses ~9e18 (the sf1 sweep hit it at 375k rows of 5e4-cent
    # values) — carry it in DECIMAL(38,0), exact to 1e38
    var_num = (
        F.col("n").cast("decimal(38,0)") * F.col("s2")
        - F.col("s").cast("decimal(38,0)") * F.col("s")
    )
    ok = (F.col("n") > 1) & (var_num > 0)
    return f.join(F.broadcast(g), "event_type").select(
        "event_id",
        "event_type",
        F.col("c").alias("cents"),
        num.cast("bigint").alias("z_num_scaled"),
        F.when(
            ok,
            (
                num.cast("double")
                * F.sqrt((F.col("n") * (F.col("n") - 1)).cast("double"))
            )
            / (F.col("n").cast("double") * F.sqrt(var_num.cast("double"))),
        ).alias("z"),
    )

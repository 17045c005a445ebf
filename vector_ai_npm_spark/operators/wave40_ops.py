"""Wave 40: crawl novelty rate, A/B power analysis.

* `text_ngram_novelty` — the incremental-corpus freshness QA: split
  documents into two md5 crawl epochs (yesterday / today) and measure
  what fraction of today's distinct 8-grams are NEW (absent from
  yesterday) — the number that tells a training-data pipeline whether
  a recrawl is adding content or re-downloading the web it already
  has.  Reuses the decontamination 8-gram machinery
  (text/curation.py): gram frames are doc-distinct TYPE-level sets,
  the anti-join runs gram-keyed, and every output is a distinct count
  — output-bounded at any corpus size.
* `events_power_analysis` — the experiment-design closer for the A/B
  suite (ab_test_summary / CUPED / KS / TVD): required sample size per
  arm for a two-sample z-test at α=0.05, power=0.8, MDE = 5% of the
  mean — n = 2(z_{α/2}+z_β)²σ²/δ² (the standard formula, e.g.
  Kohavi et al., Trustworthy Online Controlled Experiments).  σ² and
  the mean come from exact integer-cents power sums (the
  eval_regression varchar-bridge idiom for the big products); the two
  normal quantiles are Python-computed constants embedded as EXACT
  decimal expansions (in-engine erf/quantile functions are
  libm-dependent — the nDCG/RBO idiom); the final formula is ONE
  fixed-order double expression in both engines.
"""

from __future__ import annotations

from decimal import Decimal as _Dec

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.eval_metrics import (
    _duck_hash_mod,
    _o_d2d,
    _spark_hash_mod,
)
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.text.curation import _DUCK_8GRAMS, _SPARK_8GRAMS

# --------------------------------------------------------------------------
# text_ngram_novelty
# --------------------------------------------------------------------------


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id, text,
             {_duck_hash_mod("doc_id", "#crawl", 2)} AS epoch
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT epoch, unnest({_DUCK_8GRAMS}) AS gram FROM tagged
    ),
    a AS (SELECT gram FROM grams WHERE epoch = 0),
    b AS (SELECT gram FROM grams WHERE epoch = 1),
    new_b AS (SELECT gram FROM b ANTI JOIN a USING (gram))
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM tagged WHERE epoch = 0)
        AS n_docs_a,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM tagged WHERE epoch = 1)
        AS n_docs_b,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_grams_a,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_grams_b,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM new_b) AS n_new_in_b,
      CAST((SELECT COUNT(*) FROM new_b) AS DOUBLE)
        / CAST((SELECT COUNT(*) FROM b) AS DOUBLE) AS novelty_rate
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-over-epoch 8-gram novelty — see module docstring."""
    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        "doc_id", "text",
        _spark_hash_mod(F.col("doc_id"), "#crawl", 2).alias("epoch"),
    ).localCheckpoint(eager=True)  # consumed by both epoch legs + counts
    grams = (
        tagged.select(
            "epoch", F.explode(F.expr(_SPARK_8GRAMS)).alias("gram")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    a = grams.where(F.col("epoch") == 0).select("gram")
    b = grams.where(F.col("epoch") == 1).select("gram")
    new_b = b.join(a, "gram", "left_anti")
    docs_cnt = tagged.agg(
        F.sum(F.when(F.col("epoch") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_docs_a"),
        F.sum(F.when(F.col("epoch") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_docs_b"),
    )
    gram_cnt = grams.agg(
        F.sum(F.when(F.col("epoch") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_grams_a"),
        F.sum(F.when(F.col("epoch") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_grams_b"),
    )
    new_cnt = new_b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_in_b")
    )
    return (
        docs_cnt.crossJoin(F.broadcast(gram_cnt))
        .crossJoin(F.broadcast(new_cnt))
        .select(
            "n_docs_a", "n_docs_b", "n_grams_a", "n_grams_b",
            "n_new_in_b",
            (
                F.col("n_new_in_b").cast("double")
                / F.col("n_grams_b").cast("double")
            ).alias("novelty_rate"),
        )
    )


# --------------------------------------------------------------------------
# events_power_analysis
# --------------------------------------------------------------------------

# z_{0.975} + z_{0.8}: Python-computed once, embedded as the exact
# decimal expansion of the resulting double in BOTH engines
_Z_ALPHA = 1.959963984540054   # Φ⁻¹(0.975), published constant
_Z_BETA = 0.8416212335729143   # Φ⁻¹(0.80), published constant
_Z_SUM = _Z_ALPHA + _Z_BETA
_Z_LIT = f"CAST('{format(_Dec(_Z_SUM), 'f')}' AS DOUBLE)"
_MDE_FRAC = 0.05
_CENTS = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"
_D38 = "decimal(38,0)"


@query(
    "events_power_analysis",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, CAST(SUM({_CENTS}) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), folds AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(c AS DECIMAL(38,0))) AS s,
             SUM(CAST(c AS DECIMAL(38,0)) * c) AS s2
      FROM per_user
    )
    SELECT n AS n_users,
           {_o_d2d('s')} / CAST(n AS DOUBLE) AS mean_cents,
           {_o_d2d('n * s2 - s * s')}
             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS var_cents2,
           {_MDE_FRAC} * ({_o_d2d('s')} / CAST(n AS DOUBLE)) AS mde_cents,
           CAST(CEIL(
             2.0 * ({_Z_LIT} * {_Z_LIT})
               * ({_o_d2d('n * s2 - s * s')}
                  / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
               / (({_MDE_FRAC} * ({_o_d2d('s')} / CAST(n AS DOUBLE)))
                  * ({_MDE_FRAC} * ({_o_d2d('s')} / CAST(n AS DOUBLE))))
           ) AS BIGINT) AS n_per_arm
    FROM folds
    """,
)
def events_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample z-test sample size (α=.05, power=.8, MDE=5% of
    mean) — see module docstring."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.expr(_CENTS)).cast("bigint").alias("c"))
    )
    folds = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("c").cast(_D38)).alias("s"),
        F.sum(F.col("c").cast(_D38) * F.col("c")).alias("s2"),
    )
    d2d = lambda c: c.cast("string").cast("double")  # noqa: E731
    mean = d2d(F.col("s")) / F.col("n").cast("double")
    var = d2d(
        F.col("n") * F.col("s2") - F.col("s") * F.col("s")
    ) / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
    mde = F.lit(_MDE_FRAC) * mean
    n_req = (
        F.lit(2.0) * (F.lit(_Z_SUM) * F.lit(_Z_SUM)) * var / (mde * mde)
    )
    return folds.select(
        F.col("n").alias("n_users"),
        mean.alias("mean_cents"),
        var.alias("var_cents2"),
        mde.alias("mde_cents"),
        F.ceil(n_req).cast("bigint").alias("n_per_arm"),
    )

"""t-closeness (wave 14) — completes the release-gate privacy trio.

`dq_k_anonymity` (operators/curation_dq.py:43) checks group SIZE,
`dq_l_diversity` checks sensitive-value VARIETY; t-closeness (Li,
Li & Venkatasubramanian, ICDE 2007) is the stronger gate both miss:
a quasi-identifier group leaks when the DISTRIBUTION of its sensitive
attribute sits far from the global distribution, even if the group is
large and diverse.  For an ORDERED sensitive attribute the prescribed
distance is the Earth Mover's Distance with unit ground distance,
which collapses to the mean absolute difference of the CDFs:

    EMD(P, Q) = (1/(m-1)) * sum_{j<m} |CumP_j - CumQ_j|

Fixture: quasi-identifier = (lang, source) — the dq_k_anonymity pair —
and sensitive attribute = document length band (n_chars / 64, capped
at band 9; m = 10 fixed ordered bands).

Cross-engine determinism: each |CumP_j - CumQ_j| is the exact rational
|cum_g_j * N - cum_glob_j * n_g| / (n_g * N), so the numerators fold
as DECIMAL(19,0) x DECIMAL(19,0) -> (38,0) integer products (1e11-row
corpora cannot overflow), the band sum stays exact decimal, and ONE
double division by n_g * N * (m-1) lands the score (DuckDB side
through the o_dsum varchar bridge, functions/numeric.py).

Scale: one (QI, band)-keyed aggregate off a single corpus scan; the
10-band lattice, per-group CDFs (10-row partitioned windows keyed by
QI), and the 10-row global CDF (the only unpartitioned window — over
a 10-row aggregate) all live on QI-domain-sized frames.  The corpus
never re-shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.eval_metrics import _o_d2d
from vector_ai_npm_spark.registry import query

_M_BANDS = 10
_BAND = f"LEAST(CAST(FLOOR(n_chars / 64) AS BIGINT), {_M_BANDS - 1})"

# release threshold: t = 0.2 is the paper's running-example setting
_T = 0.2


@query(
    "dq_t_closeness",
    oracle=f"""
    WITH cells AS (
      SELECT lang, source, {_BAND} AS band,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY lang, source, {_BAND}
    ), groups AS (
      SELECT lang, source, CAST(SUM(cnt) AS BIGINT) AS group_n
      FROM cells GROUP BY lang, source
    ), band_dom AS (
      SELECT CAST(unnest(range(0, {_M_BANDS})) AS BIGINT) AS band
    ), gband AS (
      -- full 10-band domain: a band empty across the WHOLE corpus must
      -- still contribute its |CumP - CumQ| term (review finding r7)
      SELECT d.band, CAST(COALESCE(SUM(c.cnt), 0) AS BIGINT) AS gcnt
      FROM band_dom d LEFT JOIN cells c ON d.band = c.band
      GROUP BY d.band
    ), glob_cdf AS (
      SELECT band,
             CAST(SUM(gcnt) OVER (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_glob
      FROM gband
    ), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells),
    lattice AS (
      SELECT g.lang, g.source, g.group_n, b.band
      FROM groups g CROSS JOIN band_dom b
    ), group_cdf AS (
      SELECT l.lang, l.source, l.group_n, l.band,
             CAST(SUM(COALESCE(c.cnt, 0)) OVER (
               PARTITION BY l.lang, l.source ORDER BY l.band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_g
      FROM lattice l LEFT JOIN cells c
        ON l.lang = c.lang AND l.source = c.source AND l.band = c.band
    )
    SELECT gc.lang, gc.source, gc.group_n,
           {_o_d2d(
               "CAST(SUM(CASE WHEN gc.band < " + str(_M_BANDS - 1) + " THEN "
               "ABS(CAST(gc.cum_g AS DECIMAL(19,0)) * CAST(tot.n AS DECIMAL(19,0)) "
               "- CAST(g2.cum_glob AS DECIMAL(19,0)) * CAST(gc.group_n AS DECIMAL(19,0))) "
               "ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))"
           )}
             / (CAST(gc.group_n AS DOUBLE) * CAST(tot.n AS DOUBLE)
                * {float(_M_BANDS - 1)}) AS t_emd,
           {_o_d2d(
               "CAST(SUM(CASE WHEN gc.band < " + str(_M_BANDS - 1) + " THEN "
               "ABS(CAST(gc.cum_g AS DECIMAL(19,0)) * CAST(tot.n AS DECIMAL(19,0)) "
               "- CAST(g2.cum_glob AS DECIMAL(19,0)) * CAST(gc.group_n AS DECIMAL(19,0))) "
               "ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))"
           )}
             / (CAST(gc.group_n AS DOUBLE) * CAST(tot.n AS DOUBLE)
                * {float(_M_BANDS - 1)}) > {_T} AS at_risk
    FROM group_cdf gc
    JOIN glob_cdf g2 USING (band)
    CROSS JOIN tot
    GROUP BY gc.lang, gc.source, gc.group_n, tot.n
    """,
)
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness over (lang, source) with the length-band sensitive
    attribute — EMD between each group's band CDF and the global CDF,
    flagged against t = 0.2.  See module docstring for the exact
    rational formulation and scale shapes."""
    docs = load_table(spark, sf_dir, "documents")
    band = F.least(
        F.floor(F.col("n_chars") / 64).cast("bigint"),
        F.lit(_M_BANDS - 1).cast("bigint"),
    )
    cells = docs.groupBy("lang", "source", band.alias("band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    groups = cells.groupBy("lang", "source").agg(
        F.sum("cnt").cast("bigint").alias("group_n")
    )
    band_dom = spark.range(_M_BANDS).select(F.col("id").alias("band"))
    # full 10-band domain (review finding r7): a corpus-empty band still
    # contributes its |CumP - CumQ| term to every group's EMD
    glob = (
        band_dom.join(
            cells.groupBy("band").agg(F.sum("cnt").alias("c")), "band", "left"
        )
        .select(
            "band", F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("gcnt")
        )
    )
    w_glob = W.orderBy("band").rowsBetween(W.unboundedPreceding, 0)
    glob_cdf = glob.select(
        "band", F.sum("gcnt").over(w_glob).cast("bigint").alias("cum_glob")
    )
    # n from the reduced cells frame — never a second corpus scan
    tot = cells.agg(F.sum("cnt").cast("bigint").alias("n"))
    lattice = groups.select(
        "lang",
        "source",
        "group_n",
        F.explode(
            F.array(*[F.lit(b).cast("bigint") for b in range(_M_BANDS)])
        ).alias("band"),
    )
    w_g = (
        W.partitionBy("lang", "source")
        .orderBy("band")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    group_cdf = (
        lattice.join(cells, ["lang", "source", "band"], "left")
        .withColumn(
            "cum_g",
            F.sum(F.coalesce(F.col("cnt"), F.lit(0))).over(w_g).cast("bigint"),
        )
    )
    d19 = "decimal(19,0)"
    term = F.when(
        F.col("band") < _M_BANDS - 1,
        F.abs(
            F.col("cum_g").cast(d19) * F.col("n").cast(d19)
            - F.col("cum_glob").cast(d19) * F.col("group_n").cast(d19)
        ),
    ).otherwise(F.lit(0).cast("decimal(38,0)"))
    folded = (
        group_cdf.join(F.broadcast(glob_cdf), "band")
        .crossJoin(F.broadcast(tot))
        .groupBy("lang", "source", "group_n", "n")
        .agg(F.sum(term).cast("decimal(38,0)").alias("emd_num"))
    )
    t_emd = F.col("emd_num").cast("double") / (
        F.col("group_n").cast("double")
        * F.col("n").cast("double")
        * F.lit(float(_M_BANDS - 1))
    )
    return folded.select(
        "lang",
        "source",
        "group_n",
        t_emd.alias("t_emd"),
        (t_emd > _T).alias("at_risk"),
    )

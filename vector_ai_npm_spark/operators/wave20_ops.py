"""Wave 20: decile gains/lift, concentration, burstiness, lag
features, lang-ID confusion, per-domain caps.

Six operators closing this round's breadth pass, each exact and
oracle-checked:

* `eval_lift_gain` — the decile gains/lift table (the marketing-/
  ranking-model readout next to AUC and AUPRC): score deciles by the
  exact two-level ntile, cumulative capture rate (gain) and lift as
  exact integer fractions.
* `events_concentration_hhi` — Herfindahl-Hirschman concentration of
  events over users: Σ share² as an exact fraction plus top-1 share
  and effective-N (1/HHI).  The "is one crawler/user dominating the
  corpus" audit a data pipeline alarms on before training.
* `events_burstiness_fano` — Fano factor (variance-to-mean ratio) of
  daily counts per event type: (n·Σx² − S²)/((n−1)·S) — exact integer
  fraction; > 1 flags over-dispersion (bursty feeds), ~1 is Poisson.
  Completes the temporal-QA trio with `events_autocorr` and
  `events_cusum_drift`.
* `window_lag_features` — the feature-store lag transform: previous
  value, value delta, integer-microsecond gap since the previous
  event, and next event type, per user in time order.  One user-keyed
  window; output is per-row features (corpus-sized by design).
* `text_langid_confusion` — declared-vs-predicted language confusion
  matrix over the deterministic stopword lang-ID: the QA readout that
  decides whether the lang-ID gate is trustworthy per slice.
* `curate_domain_cap` — per-source document cap (md5-rank
  deterministic): down-samples dominant sources to ≤ cap docs — the
  domain-balancing half of `curate_mix_temperature`, as selection
  rather than quota computation.

Cross-engine determinism: integers and exact fractions throughout;
the ntile decomposition is bit-equal to the SQL window by the
`_ntile_two_level` total-order argument; gap microseconds use the
NTZ-safe timestampdiff idiom (growth_ops.window_twap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.analytics_ops import _ntile_two_level
from vector_ai_npm_spark.operators.eval_metrics import (
    _duck_hash_mod,
    _spark_hash_mod,
)
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.text.queries import (
    _DUCK_TOKS,
    _LANG_ORDER,
    _argmax_case,
    _score_spark,
    _score_sql,
)

# score synthesis with the row id kept (the cal_scored fixture carries
# only (pos, s_milli); the ntile tiebreak needs a unique id)
_CAL_ID_SQL = """
      SELECT vec_id,
             CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos,
             ({noise} + CASE WHEN label < 5 THEN 350 ELSE 50 END)
               AS s_milli
      FROM embeddings
""".format(noise=_duck_hash_mod("vec_id", "#cal", 600))

_N_TILES = 10


def _cal_scored_id(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        F.when(F.col("label") < 5, 1).otherwise(0).alias("pos"),
        (
            _spark_hash_mod(F.col("vec_id"), "#cal", 600)
            + F.when(F.col("label") < 5, 350).otherwise(50)
        ).alias("s_milli"),
    )


@query(
    "eval_lift_gain",
    oracle=f"""
    WITH scored AS (
{_CAL_ID_SQL}
    ),
    tiled AS (
      SELECT pos,
             NTILE({_N_TILES}) OVER (ORDER BY s_milli DESC, vec_id)
               AS decile
      FROM scored
    ),
    per AS (
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS n_pos
      FROM tiled GROUP BY decile
    ),
    cum AS (
      SELECT decile, n, n_pos,
             CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
             CAST(SUM(n_pos) OVER w AS BIGINT) AS cum_pos,
             CAST(SUM(n) OVER () AS BIGINT) AS tot_n,
             CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos
      FROM per
      WINDOW w AS (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT decile, n, n_pos, cum_n, cum_pos,
           CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) AS gain,
           CAST(cum_pos * tot_n AS BIGINT) AS lift_num,
           CAST(cum_n * tot_pos AS BIGINT) AS lift_den,
           CAST(cum_pos * tot_n AS DOUBLE)
             / CAST(cum_n * tot_pos AS DOUBLE) AS lift
    FROM cum
    """,
)
def eval_lift_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift — see module docstring.  The decile is the
    exact two-level ntile (bit-equal to the SQL window, physically
    bucketed); the cumulative/lift windows run over the 10-row decile
    frame only."""
    scored = _cal_scored_id(load_table(spark, sf_dir, "embeddings"))
    tiled = _ntile_two_level(
        scored,
        "decile",
        metric="s_milli",
        descending=True,
        tiebreak="vec_id",
        n_tiles=_N_TILES,
    )
    per = tiled.groupBy(F.col("decile").cast("bigint").alias("decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(w).cast("bigint").alias("cum_n"),
        F.sum("n_pos").over(w).cast("bigint").alias("cum_pos"),
        F.sum("n").over(wall).cast("bigint").alias("tot_n"),
        F.sum("n_pos").over(wall).cast("bigint").alias("tot_pos"),
    )
    return cum.select(
        "decile",
        "n",
        "n_pos",
        "cum_n",
        "cum_pos",
        (F.col("cum_pos").cast("double") / F.col("tot_pos").cast("double"))
        .alias("gain"),
        (F.col("cum_pos") * F.col("tot_n")).cast("bigint").alias("lift_num"),
        (F.col("cum_n") * F.col("tot_pos")).cast("bigint").alias("lift_den"),
        (
            (F.col("cum_pos") * F.col("tot_n")).cast("double")
            / (F.col("cum_n") * F.col("tot_pos")).cast("double")
        ).alias("lift"),
    )


@query(
    "events_concentration_hhi",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(SUM(CAST(c AS DECIMAL(19,0)) * c) AS BIGINT) AS hhi_num,
           CAST(CAST(SUM(c) AS DECIMAL(19,0)) * SUM(c) AS BIGINT)
             AS hhi_den,
           CAST(SUM(CAST(c AS DECIMAL(19,0)) * c) AS DOUBLE)
             / CAST(CAST(SUM(c) AS DECIMAL(19,0)) * SUM(c) AS DOUBLE)
             AS hhi,
           CAST(MAX(c) AS BIGINT) AS top1_count,
           CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top1_share,
           CAST(CAST(SUM(c) AS DECIMAL(19,0)) * SUM(c) AS DOUBLE)
             / CAST(SUM(CAST(c AS DECIMAL(19,0)) * c) AS DOUBLE)
             AS effective_n
    FROM per_user
    """,
)
def events_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HHI concentration of events over users — see module docstring.
    One user-keyed aggregate then a 1-row fold; int64 headroom:
    hhi_num ≤ n_events² needs ≤ 3e9 events (beyond: the DECIMAL(38,0)
    intermediates already used)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    d19 = "decimal(19,0)"
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("c").cast("bigint").alias("n_events"),
        F.sum(F.col("c").cast(d19) * F.col("c")).cast("bigint").alias(
            "hhi_num"
        ),
        (F.sum("c").cast(d19) * F.sum("c")).cast("bigint").alias("hhi_den"),
        (
            F.sum(F.col("c").cast(d19) * F.col("c")).cast("double")
            / (F.sum("c").cast(d19) * F.sum("c")).cast("double")
        ).alias("hhi"),
        F.max("c").cast("bigint").alias("top1_count"),
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias(
            "top1_share"
        ),
        (
            (F.sum("c").cast(d19) * F.sum("c")).cast("double")
            / F.sum(F.col("c").cast(d19) * F.col("c")).cast("double")
        ).alias("effective_n"),
    )


@query(
    "events_burstiness_fano",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(x) AS BIGINT) AS total,
           CAST(COUNT(*) * SUM(CAST(x AS DECIMAL(19,0)) * x)
                - CAST(SUM(x) AS DECIMAL(19,0)) * SUM(x) AS BIGINT)
             AS fano_num,
           CAST((COUNT(*) - 1) * SUM(x) AS BIGINT) AS fano_den,
           CAST(COUNT(*) * SUM(CAST(x AS DECIMAL(19,0)) * x)
                - CAST(SUM(x) AS DECIMAL(19,0)) * SUM(x) AS DOUBLE)
             / CAST((COUNT(*) - 1) * SUM(x) AS DOUBLE) AS fano
    FROM daily
    GROUP BY event_type
    HAVING COUNT(*) > 1
    """,
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Fano factor of daily counts — see module docstring.
    (Days with zero events of a type contribute no row in both
    engines — the index is over OBSERVED days, documented.)  Corpus →
    (type, day) aggregate → |types|-row fold."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    d19 = "decimal(19,0)"
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("total"),
        F.sum(F.col("x").cast(d19) * F.col("x")).alias("sxx"),
    )
    num = (
        F.col("n_days") * F.col("sxx")
        - F.col("total").cast(d19) * F.col("total")
    )
    den = (F.col("n_days") - 1) * F.col("total")
    return g.where(F.col("n_days") > 1).select(
        "event_type",
        "n_days",
        "total",
        num.cast("bigint").alias("fano_num"),
        den.cast("bigint").alias("fano_den"),
        (num.cast("double") / den.cast("double")).alias("fano"),
    )


@query(
    "window_lag_features",
    oracle="""
    SELECT event_id, user_id,
           LAG(value) OVER w AS prev_value,
           value - LAG(value) OVER w AS value_delta,
           CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT)
             AS gap_us,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag/lead features in time order — see module
    docstring.  ONE user-keyed window serves all four features; the
    microsecond gap is the NTZ-safe integer timestampdiff."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("_t"),
        F.lag(
            F.expr(
                "timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
        ).over(w).alias("_t_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    ).select(
        "event_id",
        "user_id",
        "prev_value",
        "value_delta",
        (F.col("_t") - F.col("_t_prev")).cast("bigint").alias("gap_us"),
        "next_type",
    )


@query(
    "text_langid_confusion",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents),
    pred AS (
      SELECT lang AS labeled_lang,
             {_argmax_case({l: _score_sql(l, 'toks') for l in _LANG_ORDER})}
               AS predicted_lang
      FROM t
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM pred)
    SELECT labeled_lang, predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           labeled_lang = predicted_lang AS is_correct,
           CAST(COUNT(*) AS DOUBLE) / CAST(ANY_VALUE(t2.n_docs) AS DOUBLE)
             AS share
    FROM pred CROSS JOIN tot t2
    GROUP BY labeled_lang, predicted_lang
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-predicted language confusion matrix — see module
    docstring.  Corpus reduces to the ≤|langs|² matrix in one
    aggregate; the total attaches as a broadcast scalar."""
    docs = load_table(spark, sf_dir, "documents")
    scores = {l: _score_spark(l) for l in _LANG_ORDER}
    pred = docs.select(
        F.col("lang").alias("labeled_lang"),
        F.expr(_argmax_case(scores)).alias("predicted_lang"),
    )
    tot = pred.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        pred.groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "labeled_lang",
            "predicted_lang",
            "n",
            (F.col("labeled_lang") == F.col("predicted_lang")).alias(
                "is_correct"
            ),
            (F.col("n").cast("double") / F.col("n_docs").cast("double"))
            .alias("share"),
        )
    )


_DOMAIN_CAP = 30


@query(
    "curate_domain_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '#cap'), doc_id
             ) AS pick_rank,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT)
               AS source_total
      FROM documents
    )
    SELECT doc_id, source, CAST(pick_rank AS BIGINT) AS pick_rank,
           source_total, source_total > {_DOMAIN_CAP} AS was_capped
    FROM ranked WHERE pick_rank <= {_DOMAIN_CAP}
    """,
)
def curate_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap at {_DOMAIN_CAP} — see module
    docstring.  The md5 pick order is seedless and
    partitioning-stable (the sampling-family idiom), so the KEPT SET
    is deterministic; the per-source rank is a keyed window
    (WindowGroupLimit prunes at the cap)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#cap"))),
        F.col("doc_id"),
    )
    wtot = Window.partitionBy("source")
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("bigint").alias("pick_rank"),
        F.count(F.lit(1)).over(wtot).cast("bigint").alias("source_total"),
    )
    return ranked.where(F.col("pick_rank") <= _DOMAIN_CAP).select(
        "doc_id",
        "source",
        "pick_rank",
        "source_total",
        (F.col("source_total") > _DOMAIN_CAP).alias("was_capped"),
    )

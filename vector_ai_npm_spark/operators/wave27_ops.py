"""Wave 27: IVF probe-sweep recall curve, user-activity audit.

* `vector_recall_curve` — the (nprobe → recall@k) curve that tunes
  the IVF cost/recall knob (FAISS's nprobe sweep as a first-class
  operator): recall@5 vs the exact top-k for the 3 standard query
  vectors at nprobe ∈ 1, 2, 4, 8 with nlist = 8.  Cell assignment is
  model-defined, so per-level recalls ride pytest (exact numbers
  asserted there); the DRIVER face pins what IS invariant:
  monotonicity in nprobe (probing more cells can only add candidates)
  and the full-probe identity — nprobe = nlist scans every cell, so
  recall@5 is EXACTLY 15/15 (the `ivf_store_recall` contract style).
* `events_user_activity_audit` — the bot-triage queue: the top-50
  most active users with exact integer behavior features (event and
  active-day counts, events/day as an exact fraction, night-hour
  events, peak events-per-minute).  A rule-based flag would be
  vacuous on the organic fixture (measured: ≤3.1 events/day, ≤2 per
  minute — no bot tail), so the operator emits the ranked evidence
  table a reviewer or downstream rule consumes, all hash-checkable.

Scale shape: the recall curve's store side is the IVF contract
(centroid assignment one pass, probe scan ~nprobe/nlist of the
store); the audit is one user-keyed aggregate plus a (user, minute)
sub-aggregate that reduces before its max, top-50 via
TakeOrderedAndProject.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.vectors import cosine_similarity
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_QUERY_IDS = (0, 7, 42)
_K = 5
_NLIST = 8
_PROBES = (1, 2, 4, 8)


@query(
    "vector_recall_curve",
    oracle=f"""
    SELECT CAST({len(_PROBES)} AS BIGINT) AS n_levels,
           CAST({_K} AS BIGINT) AS k,
           CAST({len(_QUERY_IDS)} AS BIGINT) AS n_queries,
           TRUE AS monotone_ok,
           CAST({_K * len(_QUERY_IDS)} AS BIGINT) AS full_probe_num,
           CAST({_K * len(_QUERY_IDS)} AS BIGINT) AS full_probe_den
    """,
)
def vector_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nprobe sweep contract — see module docstring.  The seeded
    quantizer makes every level deterministic; the full-probe level
    (nprobe = nlist) must reproduce the exact top-k verbatim, and
    overlap counts must be non-decreasing in nprobe."""
    from vector_ai_npm_spark.retrieval.ivf import ivf_similarity_join

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    # exact top-k per query (the reference set; self-match included on
    # both sides, so the comparison is like-for-like)
    cand = emb.crossJoin(F.broadcast(queries))
    w = Window.partitionBy("q_vec_id").orderBy(
        cosine_similarity(
            F.col("embedding").cast("array<double>"),
            F.col("q_embedding").cast("array<double>"),
        ).desc(),
        F.col("vec_id").asc(),
    )
    exact = (
        cand.select("q_vec_id", "vec_id", F.row_number().over(w).alias("r"))
        .where(F.col("r") <= _K)
        .select(
            F.col("q_vec_id").alias("e_q"), F.col("vec_id").alias("e_v")
        )
    )
    levels = []
    for p in _PROBES:
        hits = ivf_similarity_join(
            queries, emb, k=_K, nlist=_NLIST, nprobe=p
        ).select("q_vec_id", "vec_id")
        overlap = hits.join(
            exact,
            (hits.q_vec_id == exact.e_q) & (hits.vec_id == exact.e_v),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
        levels.append(
            overlap.select(
                F.lit(p).cast("bigint").alias("nprobe"), "n_hits"
            )
        )
    curve = reduce(lambda a, b: a.unionByName(b), levels)
    wlag = Window.orderBy("nprobe")  # 4-row frame: bounded by construction
    folded = curve.select(
        "nprobe",
        "n_hits",
        F.lag("n_hits").over(wlag).alias("prev_hits"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_levels"),
        F.min(
            F.when(F.col("prev_hits").isNull(), True).otherwise(
                F.col("n_hits") >= F.col("prev_hits")
            )
        ).alias("monotone_ok"),
        F.max(F.when(F.col("nprobe") == _NLIST, F.col("n_hits")))
        .cast("bigint")
        .alias("full_probe_num"),
    )
    return folded.select(
        "n_levels",
        F.lit(_K).cast("bigint").alias("k"),
        F.lit(len(_QUERY_IDS)).cast("bigint").alias("n_queries"),
        "monotone_ok",
        "full_probe_num",
        F.lit(_K * len(_QUERY_IDS)).cast("bigint").alias("full_probe_den"),
    )


_TOP_N = 50
_NIGHT_END = 6


@query(
    "events_user_activity_audit",
    oracle=f"""
    WITH per_min AS (
      SELECT user_id, date_trunc('minute', ts) AS m,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    peaks AS (
      SELECT user_id, CAST(MAX(c) AS BIGINT) AS max_per_minute
      FROM per_min GROUP BY user_id
    ),
    base AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
             CAST(COUNT(*) FILTER (
               WHERE EXTRACT(hour FROM ts) < {_NIGHT_END}) AS BIGINT)
               AS night_events
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT b.*, p.max_per_minute,
             ROW_NUMBER() OVER (ORDER BY b.n_events DESC, b.user_id)
               AS rnk
      FROM base b JOIN peaks p ON p.user_id = b.user_id
    )
    SELECT user_id, n_events, n_days, night_events, max_per_minute,
           CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE)
             AS events_per_day,
           CAST(night_events AS DOUBLE) / CAST(n_events AS DOUBLE)
             AS night_share
    FROM ranked WHERE rnk <= {_TOP_N}
    """,
)
def events_user_activity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-50 (_TOP_N) activity audit — see module docstring.  One user-keyed
    aggregate + a (user, minute) sub-aggregate whose max reduces
    before joining back; the global top-50 is TakeOrderedAndProject
    over the user frame (never a full sort)."""
    ev = load_table(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "user_id", F.date_trunc("minute", "ts").alias("m")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    peaks = per_min.groupBy("user_id").agg(
        F.max("c").cast("bigint").alias("max_per_minute")
    )
    base = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct(F.col("ts").cast("date"))
        .cast("bigint")
        .alias("n_days"),
        F.count(F.when(F.hour("ts") < _NIGHT_END, 1))
        .cast("bigint")
        .alias("night_events"),
    )
    joined = base.join(peaks, "user_id")
    top = joined.orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    ).limit(_TOP_N)
    return top.select(
        "user_id", "n_events", "n_days", "night_events", "max_per_minute",
        (
            F.col("n_events").cast("double") / F.col("n_days").cast("double")
        ).alias("events_per_day"),
        (
            F.col("night_events").cast("double")
            / F.col("n_events").cast("double")
        ).alias("night_share"),
    )

"""Maximal Marginal Relevance (MMR) diversity re-ranking.

Reference context: the reference's answer path already fights redundancy
— `getAnswer` groups retrieved chunks by shared parent context so the
prompt never repeats near-identical text (vector-client.ts:434-444, the
A9 dedup). MMR is the principled generalization of that instinct
(Carbonell & Goldstein, SIGIR 1998): greedily select results that are
relevant to the query AND dissimilar to what's already selected,

    pick_r = argmax_d  λ·sim(d, q) − (1−λ)·max_{s∈selected} sim(d, s)

Engine shape (the 100 TB story):
  * Stage 1 — candidate generation — is the EXISTING exact/ANN top-k
    machinery (retrieval.search / retrieval.lsh): distributed, pruned,
    JVM-side. MMR only ever sees k_candidates rows per query.
  * Stage 2 — the greedy selection — is inherently sequential *per
    query* but embarrassingly parallel *across queries*: one
    `applyInPandas` over q_vec_id groups, each group a ≤k_candidates
    row frame. Per-group cost is O(k²·dim) in vectorized numpy; state
    never exceeds the candidate set. A million queries fan out across
    executors with no shuffle beyond the candidate join's.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.retrieval.search import similarity_join

_OUT_SCHEMA = (
    "q_vec_id long, mmr_rank long, vec_id long, "
    "relevance double, mmr_score double"
)


def _mmr_select(pdf: pd.DataFrame, k: int, lam: float) -> pd.DataFrame:
    """Greedy MMR over one query's candidate frame (already ranked by
    relevance; `rank` is the deterministic tiebreak)."""
    pdf = pdf.sort_values("rank").reset_index(drop=True)
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0.0] = 1.0
    unit = vecs / norms[:, None]
    pair = unit @ unit.T  # candidate×candidate cosine
    rel = pdf["similarity"].to_numpy(dtype=np.float64)

    n = len(pdf)
    selected: list[int] = []
    scores: list[float] = []
    penalty = np.zeros(n)  # max cosine to the selected set, per candidate
    remaining = np.ones(n, dtype=bool)
    for _ in range(min(k, n)):
        mmr = lam * rel - (1.0 - lam) * penalty
        mmr[~remaining] = -np.inf
        # argmax with the rank-order tiebreak: np.argmax returns the
        # FIRST maximal index and rows are rank-sorted, so ties resolve
        # to the better exact rank — same rule both engines can mirror
        best = int(np.argmax(mmr))
        selected.append(best)
        scores.append(float(mmr[best]))
        remaining[best] = False
        penalty = np.maximum(penalty, pair[:, best])
    return pd.DataFrame(
        {
            "q_vec_id": pdf["q_vec_id"].iloc[selected].to_numpy(),
            "mmr_rank": np.arange(1, len(selected) + 1, dtype=np.int64),
            "vec_id": pdf["vec_id"].iloc[selected].to_numpy(),
            "relevance": rel[selected],
            "mmr_score": np.asarray(scores),
        }
    )


def mmr_rerank(
    queries: DataFrame,
    store: DataFrame,
    k: int = 5,
    k_candidates: int = 20,
    lam: float = 0.7,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Two-stage diverse retrieval: exact top-`k_candidates` per query
    (distributed, JVM-side), then per-query greedy MMR down to `k`
    (Arrow-batched, parallel across queries).

    Pass `candidates` to re-rank an existing (q_vec_id, vec_id,
    similarity, rank) frame — e.g. the ANN path's output — instead of
    recomputing the exact join."""
    if candidates is None:
        candidates = similarity_join(
            queries, store, k=k_candidates, threshold=-1.0
        )
    with_vecs = candidates.join(
        store.select("vec_id", "embedding"), "vec_id"
    ).select("q_vec_id", "vec_id", "similarity", "rank", "embedding")
    return with_vecs.groupBy("q_vec_id").applyInPandas(
        lambda pdf: _mmr_select(pdf, k=k, lam=lam), schema=_OUT_SCHEMA
    )


def mmr_contract_rows(
    spark_mmr_div: DataFrame,
    spark_mmr_l1: DataFrame,
    exact_topk: DataFrame,
    k: int,
    query_ids: Iterable[int],
) -> DataFrame:
    """Distributed checks turning the (non-SQL) greedy selection into
    oracle-pinnable booleans, one row per (method, query):

      * `mmr_lambda1` — with λ=1 the penalty term vanishes, so MMR MUST
        reproduce the exact top-k ranking position-for-position (a
        complete equivalence gate on the selection machinery).
      * `mmr_diverse` — at working λ: ranks are exactly 1..k with k
        distinct picks drawn from the candidate set, rank 1 equals the
        exact top-1 (λ·rel dominates an empty penalty), and mmr_score
        is non-increasing in rank (greedy max over a pointwise
        shrinking objective — see retrieval.mmr docstring)."""
    ex = exact_topk.select(
        "q_vec_id", F.col("vec_id").alias("e_vec_id"), F.col("rank").alias("e_rank")
    )
    l1_ok = (
        spark_mmr_l1.join(
            ex,
            (spark_mmr_l1.q_vec_id == ex.q_vec_id)
            & (spark_mmr_l1.vec_id == ex.e_vec_id)
            & (spark_mmr_l1.mmr_rank == ex.e_rank),
            "left",
        )
        .groupBy(spark_mmr_l1.q_vec_id)
        .agg(
            (F.count("e_vec_id") == F.lit(k)).alias("ok"),
        )
        .select(
            F.lit("mmr_lambda1").alias("method"),
            F.concat(F.lit("q"), F.col("q_vec_id").cast("string")).alias("scope"),
            "ok",
        )
    )
    w_prev = F.lag("mmr_score").over(
        Window.partitionBy("q_vec_id").orderBy("mmr_rank")
    )
    div = (
        spark_mmr_div.join(
            ex.select("q_vec_id", "e_vec_id").where(F.col("e_rank") == 1),
            "q_vec_id",
            "left",
        )
        .withColumn("prev_score", w_prev)
        .groupBy("q_vec_id")
        .agg(
            (
                (F.countDistinct("vec_id") == F.lit(k))
                & (F.count(F.lit(1)) == F.lit(k))
                & (F.min("mmr_rank") == 1)
                & (F.max("mmr_rank") == F.lit(k))
                & F.bool_and(
                    F.when(F.col("mmr_rank") == 1, F.col("vec_id") == F.col("e_vec_id"))
                    .otherwise(F.lit(True))
                )
                & F.bool_and(
                    F.coalesce(
                        F.col("mmr_score") <= F.col("prev_score") + F.lit(1e-12),
                        F.lit(True),
                    )
                )
            ).alias("ok")
        )
        .select(
            F.lit("mmr_diverse").alias("method"),
            F.concat(F.lit("q"), F.col("q_vec_id").cast("string")).alias("scope"),
            "ok",
        )
    )
    return l1_ok.unionByName(div)

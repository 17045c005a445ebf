"""Invariants for the k-means / SemDeDup suite (clustering/queries.py).

The DuckDB hash oracle (test_oracle_parity) pins exact values; these
tests pin the *algorithmic* properties the oracle can't see: Lloyd
monotonicity, assignment validity, and the dedup policy's semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.clustering.queries import (
    K,
    SEMDEDUP_TAU,
    _assign,
    _emb_frame,
    kmeans_assign,
)


def test_kmeans_objective_decreases(spark, sf_oracle):
    """Lloyd's algorithm is monotone: WSS after (update + reassign)
    must be <= WSS of the seed assignment. A tie-break or centroid
    arithmetic bug typically breaks monotonicity before it breaks
    row counts."""
    emb = _emb_frame(spark, sf_oracle)
    seeds_rows = (
        emb.where(F.col("vec_id") < K).orderBy("vec_id").collect()
    )
    seeds = [[float(v) for v in r.emb] for r in seeds_rows]
    wss1 = (
        _assign(emb, seeds).agg(F.sum("sq_dist").alias("w")).first()["w"]
    )
    wss2 = (
        kmeans_assign(emb).agg(F.sum("sq_dist").alias("w")).first()["w"]
    )
    assert wss2 <= wss1 + 1e-9, (wss1, wss2)


def test_kmeans_assignment_is_valid(spark, sf_oracle):
    out = registry.run("cluster_kmeans_assign", spark, sf_oracle)
    n_bad = out.where(
        (F.col("cluster_id") < 0)
        | (F.col("cluster_id") >= K)
        | (F.col("sq_dist") < 0)
    ).count()
    assert n_bad == 0
    # every input row assigned exactly once
    n_in = _emb_frame(spark, sf_oracle).count()
    assert out.count() == n_in
    assert out.select("vec_id").distinct().count() == n_in


def test_semdedup_policy_semantics(spark, sf_oracle):
    """A dropped row must have a lower-id same-cluster neighbor within
    tau; a kept row must have none (the pair-dominance policy, both
    directions)."""
    out = registry.run("dedup_semantic", spark, sf_oracle)
    emb = _emb_frame(spark, sf_oracle)
    joined = out.join(emb, "vec_id")
    a = joined.select(
        F.col("vec_id").alias("ia"),
        F.col("cluster_id").alias("ca"),
        F.col("emb").alias("ea"),
    )
    b = joined.select(
        F.col("vec_id").alias("ib"),
        F.col("cluster_id").alias("cb"),
        F.col("emb").alias("eb"),
        F.col("is_kept").alias("kept_b"),
    )
    from vector_ai_npm_spark.functions.vectors import cosine_similarity

    pairs = a.join(
        b, (F.col("ca") == F.col("cb")) & (F.col("ia") < F.col("ib"))
    ).withColumn("cos", cosine_similarity(F.col("ea"), F.col("eb")))
    dominated = (
        pairs.where(F.col("cos") >= SEMDEDUP_TAU)
        .select(F.col("ib").alias("vec_id"))
        .distinct()
    )
    # dropped <=> dominated (exact set equality via two anti-joins)
    dropped = out.where(~F.col("is_kept")).select("vec_id")
    assert dropped.exceptAll(dominated).count() == 0
    assert dominated.exceptAll(dropped).count() == 0


def test_semdedup_recall_is_perfect_on_fixture(spark, sf_oracle):
    row = registry.run("semdedup_recall", spark, sf_oracle).first()
    assert row.recall_ok
    # the planted perturbation is tiny; on the fixture every planted
    # copy should co-cluster with its original
    assert row.n_caught == row.n_planted

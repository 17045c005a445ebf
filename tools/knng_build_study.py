#!/usr/bin/env python
"""Round-12 item 1: measure the kNN-graph BUILD at sf1 (20k vectors).

r11 evidence (TUNING.md addendum 3): with 8,080 exact-scored
candidates per query (40% of the corpus), overlap recovered only
(3,2,4)/15 = 0.60 — navigation exonerated, the NN-descent graph build
(fixed sign-LSH seeding bits=10/tables=6, 3 refine rounds) degrades at
20k fresh-draw vectors.  This study isolates build-side variants:

  A. r11 baseline            (LSH seeds, 3 refine rounds)
  B. + random long-range seed edges (classic NN-descent random init)
  C. + scaled refine rounds  (3 + 1/decade beyond 2k)
  D. B + C combined

and reports per-variant: graph recall (fraction of each node's true
top-k present in its edge list, on a 500-node sample), search overlap
for the 3 contract queries, and build wall time.

    python tools/knng_build_study.py [sf_dir]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession, functions as F

from vector_ai_npm_spark.retrieval import knn_graph as kg
from vector_ai_npm_spark.retrieval.search import similarity_join
from vector_ai_npm_spark.io.sources import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"


def overlap(spark, emb, graph, queries, n):
    beam, entries, budget = kg.scaled_search_params(n)
    hits = kg.knn_graph_search(
        queries, emb, graph, k=5, beam=beam, rounds=kg._ROUNDS,
        n_entries=entries,
    ).select("q_vec_id", "vec_id")
    exact = similarity_join(queries, emb, k=5, threshold=-1.0).select(
        "q_vec_id", "vec_id"
    )
    per_q = (
        exact.join(hits, ["q_vec_id", "vec_id"])
        .groupBy("q_vec_id").count().orderBy("q_vec_id").collect()
    )
    return {r["q_vec_id"]: r["count"] for r in per_q}


def graph_recall(spark, emb, graph, n, sample=300, k=12):
    """Fraction of each sampled node's EXACT top-k that its out-edge
    list contains — the direct build-quality metric."""
    q = (
        emb.orderBy(F.md5(F.concat(F.col("vec_id").cast("string"), F.lit("#gr"))))
        .limit(sample)
        .select(F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding"))
    )
    exact = similarity_join(q, emb, k=k + 1, threshold=-1.0).where(
        F.col("q_vec_id") != F.col("vec_id")
    ).select("q_vec_id", "vec_id")
    got = (
        exact.join(
            graph.select(F.col("src").alias("q_vec_id"), F.col("dst").alias("vec_id")),
            ["q_vec_id", "vec_id"],
        ).count()
    )
    return got / (sample * k)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("knng-study").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    queries = emb.where(F.col("vec_id").isin(0, 7, 42)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    ).localCheckpoint(eager=True)
    print(f"n={n}")

    variants = {
        "A_baseline": dict(refine_rounds=3),
    }
    if hasattr(kg, "scaled_build_params"):
        variants["S_scaled"] = "scaled"
    for name, kwargs in variants.items():
        t0 = time.time()
        if kwargs == "scaled":
            graph = kg.build_knn_graph(emb, k=kg._KG, **kg.scaled_build_params(n))
        else:
            graph = kg.build_knn_graph(emb, k=kg._KG, **kwargs)
        graph = graph.localCheckpoint(eager=True)
        bt = time.time() - t0
        gr = graph_recall(spark, emb, graph, n, k=kg._KG)
        ov = overlap(spark, emb, graph, queries, n)
        print(f"{name}: build={bt:.1f}s graph_recall={gr:.3f} "
              f"search_overlap={ov} sum={sum(ov.values())}/15")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""kNN-graph symmetrization study at sf1 — r12 item 1, third probe.

q0 stays at overlap 2 under every build variant: hypothesis is
REACHABILITY — per-src top-k truncation drops reverse edges, so
anti-hub nodes (in near-orthogonal space many nodes are in nobody's
top-k) have zero in-degree and no search can ever visit them.
Symmetrize (g ∪ reverse(g)) to guarantee in-degree ≥ k for every node
and measure; also check in-degree-0 counts directly.

    python tools/knng_sym_study.py [sf_dir]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession, functions as F

from vector_ai_npm_spark.retrieval import knn_graph as kg
from vector_ai_npm_spark.io.sources import load_table

sys.path.insert(0, str(Path(__file__).resolve().parent))
from knng_build_study import overlap  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("knng-sym").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    queries = emb.where(F.col("vec_id").isin(0, 7, 42)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    ).localCheckpoint(eager=True)

    t0 = time.time()
    g = kg.build_knn_graph(
        emb, k=kg._KG, refine_rounds=4, random_tables=2, build_degree=24,
        long_range=4,
    ).localCheckpoint(eager=True)
    print(f"build kb24_r4_lr4: {time.time()-t0:.1f}s", flush=True)

    # how many nodes have zero in-degree in the directed graph?
    indeg0 = (
        emb.select("vec_id")
        .join(g.select(F.col("dst").alias("vec_id")).distinct(),
              "vec_id", "left_anti")
        .count()
    )
    print(f"in-degree-0 nodes: {indeg0}/{n}", flush=True)
    # and specifically: are q0's exact top-5 reachable (in-degree > 0)?
    from vector_ai_npm_spark.retrieval.search import similarity_join
    exact = similarity_join(queries, emb, k=5, threshold=-1.0).select(
        "q_vec_id", "vec_id"
    )
    missing = (
        exact.join(g.select(F.col("dst").alias("vec_id")).distinct(),
                   "vec_id", "left_anti")
        .groupBy("q_vec_id").count().collect()
    )
    print(f"exact-top5 members with in-degree 0: {missing}", flush=True)

    sym = g.unionByName(
        g.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "sim"
        )
    ).dropDuplicates(["src", "dst"]).localCheckpoint(eager=True)
    ov = overlap(spark, emb, sym, queries, n)
    print(f"RESULT sym(kb24_r4_lr4): overlap={ov} sum={sum(ov.values())}/15",
          flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""kNN-graph build variant sweep at sf1 — r12 item 1 follow-up.

First study showed random long-range seeds + an extra refine round
barely move graph recall (0.205 -> 0.238 at 20k): descent stalls at
working degree 12.  This sweep isolates the working-degree lever
(build_degree) and measures graph recall + contract search overlap.

    python tools/knng_variants_study.py [sf_dir]
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
from knng_build_study import graph_recall, overlap  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"

VARIANTS = {
    "kb24_r4_lr4": dict(
        refine_rounds=4, random_tables=2, build_degree=24, long_range=4
    ),
    "kb36_r4_lr4": dict(
        refine_rounds=4, random_tables=2, build_degree=36, long_range=4
    ),
    "kb24_r3_lr4": dict(
        refine_rounds=3, random_tables=2, build_degree=24, long_range=4
    ),
}


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("knng-variants").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    queries = emb.where(F.col("vec_id").isin(0, 7, 42)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    ).localCheckpoint(eager=True)
    print(f"n={n}", flush=True)
    for name, kwargs in VARIANTS.items():
        t0 = time.time()
        graph = kg.build_knn_graph(emb, k=kg._KG, **kwargs).localCheckpoint(
            eager=True
        )
        bt = time.time() - t0
        gr = graph_recall(spark, emb, graph, n, k=kg._KG)
        ov = overlap(spark, emb, graph, queries, n)
        print(
            f"RESULT {name}: build={bt:.1f}s graph_recall={gr:.3f} "
            f"search_overlap={ov} sum={sum(ov.values())}/15",
            flush=True,
        )


if __name__ == "__main__":
    main()

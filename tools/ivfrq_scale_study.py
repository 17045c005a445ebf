#!/usr/bin/env python
"""Round-12 item 2: IVF-RQ recall at sf1 under index-capacity scaling.

r11 sf1 sweep: `ivfrq_recall_contract` red — the full-probe ADC
shortlist (max(4k, probed/5)) misses true top-5 members at 20k
vectors because a FIXED 4-byte code's ordering noise swamps the
narrowing sim gap as the corpus grows.  Variants (base ≤2k unchanged):

  A. r11 baseline      nlist=8  nstages=4 ksub=16
  B. +stages           nlist=8  nstages=6 ksub=16   (6 bytes @20k)
  C. +cells            nlist=16 nstages=4 ksub=16
  D. both              nlist=16 nstages=6 ksub=16

reports per-variant recall at nprobe=half and nprobe=full for the 3
contract queries.

    python tools/ivfrq_scale_study.py [sf_dir]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession, functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.retrieval.rq import build_ivfrq_index, ivfrq_search_index
from vector_ai_npm_spark.retrieval.search import similarity_join

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
QIDS = (0, 7, 42)


def run_variant(spark, emb, exact, name, nlist, nstages, ksub):
    t0 = time.time()
    idx, cents, books, counts = build_ivfrq_index(
        emb, nlist=nlist, nstages=nstages, ksub=ksub
    )
    idx = idx.localCheckpoint(eager=True)
    bt = time.time() - t0
    for probe_name, nprobe in (("half", nlist // 2), ("full", nlist)):
        frames = []
        for qid in QIDS:
            qvec = list(
                emb.where(F.col("vec_id") == qid).select("embedding").first()[0]
            )
            frames.append(
                ivfrq_search_index(
                    idx, cents, books, emb, qvec, k=5, nprobe=nprobe,
                    cell_counts=counts,
                ).withColumn("q_vec_id", F.lit(qid).cast("long"))
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        ov = (
            exact.join(out.select("q_vec_id", "vec_id"), ["q_vec_id", "vec_id"])
            .groupBy("q_vec_id").count().orderBy("q_vec_id").collect()
        )
        d = {r["q_vec_id"]: r["count"] for r in ov}
        print(f"{name} nprobe={probe_name}({nprobe}/{nlist}): overlap={d} "
              f"sum={sum(d.values())}/15 build={bt:.1f}s", flush=True)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("ivfrq-study").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)
    queries = emb.where(F.col("vec_id").isin(*QIDS)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    exact = similarity_join(queries, emb, k=5, threshold=0.0).select(
        "q_vec_id", "vec_id"
    ).localCheckpoint(eager=True)
    print(f"n={emb.count()}")
    run_variant(spark, emb, exact, "A_base", 8, 4, 16)
    run_variant(spark, emb, exact, "B_stages", 8, 6, 16)
    run_variant(spark, emb, exact, "C_cells", 16, 4, 16)
    run_variant(spark, emb, exact, "D_both", 16, 6, 16)


if __name__ == "__main__":
    main()

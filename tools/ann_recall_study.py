#!/usr/bin/env python
"""100× ANN recall study (round-9 verdict item 4).

The round-8 sf0.1 sweep showed the failure mode that motivates the
probed-scaled ADC re-rank budget: FIXED shortlists starve the exact
re-rank as the corpus grows (recall@5 fell 0.73 → 0.47 at 10× with
shortlist 20).  The fix (shortlist = max(4k, probed/5)) was validated
at sf0.1/10×; this tool extends the measurement to 100× so the scaling
rule is proven where the bug actually lives — corpus growth.

Corpus construction: the sf0.1 embeddings (2 000 × dim 64) replicated
COPIES× with SHIFTED vec_ids and DETERMINISTIC per-(row, copy)
Gaussian perturbation (rel. scale 0.1, copy 0 exact) — the corpus
grows with realistic near-neighbors instead of the degenerate exact
ties a verbatim copy would plant (100 identical vectors would make
recall@5 trivially 1.0 and measure nothing).

Per scale ∈ {1×, 10×, 100×} and per query ∈ {0, 7, 42} it reports
recall@5 vs the exact cosine top-5 for:

  * IVF-PQ with the probed-SCALED budget (the shipped default);
  * IVF-PQ with the FIXED 20-row shortlist (the round-8 bug, kept as
    the contrast arm);
  * OPQ (rotation + PQ + scaled-budget ADC + exact re-rank).

Run:  python tools/ann_recall_study.py           # all scales
      python tools/ann_recall_study.py 1 10      # subset

Output: one JSON line per (scale, variant) — paste into BASELINE §4.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SRC = "/root/testdata/sf0.1"
QUERY_IDS = (0, 7, 42)
VEC_SHIFT = 10**7
NOISE_REL = 0.1
K = 5


def build_corpus(spark, copies: int) -> str:
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    from vector_ai_npm_spark.io.sources import load_table

    dst = f"/tmp/ann_recall_x{copies}"
    if Path(dst).exists():
        return dst
    base = load_table(spark, SRC, "embeddings")

    @pandas_udf("array<double>")
    def _perturb(vec: pd.Series, vid: pd.Series, copy: pd.Series) -> pd.Series:
        out = []
        for v, i, c in zip(vec, vid, copy):
            x = np.asarray(v, dtype=np.float64)
            if c:
                rng = np.random.default_rng(int(i) * 1009 + int(c))
                x = x + rng.standard_normal(x.shape) * (
                    NOISE_REL * float(np.linalg.norm(x)) / np.sqrt(len(x))
                )
            out.append(x)
        return pd.Series(out)

    copies_df = spark.range(copies).withColumnRenamed("id", "copy")
    (
        base.crossJoin(F.broadcast(copies_df))
        .select(
            (F.col("vec_id") + F.col("copy") * VEC_SHIFT).alias("vec_id"),
            "label",
            _perturb(
                F.col("embedding").cast("array<double>"),
                F.col("vec_id"),
                F.col("copy"),
            ).cast("array<float>").alias("embedding"),
        )
        .repartition(max(4, copies // 4))
        .write.mode("overwrite")
        .parquet(f"{dst}/embeddings.parquet")
    )
    return dst


def exact_top5(spark, emb, qvec):
    from vector_ai_npm_spark.retrieval.search import similarity_search_topk

    return {
        r.vec_id
        for r in similarity_search_topk(
            emb.select("vec_id", "embedding"), qvec, threshold=-1.0, k=K
        ).collect()
    }


def study_scale(spark, copies: int) -> list[dict]:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.functions.vectors import cosine_similarity
    from vector_ai_npm_spark.retrieval.opq import (
        opq_rotate,
        train_opq_rotation,
    )
    from vector_ai_npm_spark.retrieval.pq import (
        build_ivfpq_index,
        ivfpq_search_index,
        pq_adc_search,
        pq_encode,
        train_pq,
    )

    dst = build_corpus(spark, copies)
    emb = spark.read.parquet(f"{dst}/embeddings.parquet")
    n_vecs = emb.count()
    qvecs = {
        qid: list(
            emb.where(F.col("vec_id") == qid).select("embedding").first()[0]
        )
        for qid in QUERY_IDS
    }
    exact = {qid: exact_top5(spark, emb, qvecs[qid]) for qid in QUERY_IDS}
    rows = []

    # ---- IVF-PQ: scaled vs fixed budget --------------------------------
    t0 = time.perf_counter()
    index, cents, books, cell_counts = build_ivfpq_index(emb, nlist=8)
    index = index.persist(StorageLevel.MEMORY_AND_DISK)
    index.count()
    build_s = time.perf_counter() - t0
    for variant, shortlist in (("scaled", None), ("fixed20", 20)):
        recalls, t0 = {}, time.perf_counter()
        for qid in QUERY_IDS:
            hits = {
                r.vec_id
                for r in ivfpq_search_index(
                    index, cents, books, emb, qvecs[qid],
                    k=K, nprobe=4, shortlist=shortlist,
                    cell_counts=cell_counts,
                ).collect()
            }
            recalls[f"q{qid}"] = len(hits & exact[qid]) / K
        rows.append({
            "study": "ann_recall_100x", "method": f"ivfpq_{variant}",
            "copies": copies, "n_vecs": n_vecs,
            "recall5_mean": round(sum(recalls.values()) / len(recalls), 3),
            **{k: round(v, 2) for k, v in recalls.items()},
            "build_s": round(build_s, 2),
            "search_s": round(time.perf_counter() - t0, 2),
        })
    index.unpersist()

    # ---- OPQ with the scaled budget ------------------------------------
    t0 = time.perf_counter()
    R = train_opq_rotation(emb)
    rot = opq_rotate(emb, R).persist(StorageLevel.MEMORY_AND_DISK)
    obooks = train_pq(rot)
    enc = pq_encode(rot, obooks).persist(StorageLevel.MEMORY_AND_DISK)
    enc.count()
    build_s = time.perf_counter() - t0
    recalls, t0 = {}, time.perf_counter()
    for qid in QUERY_IDS:
        q = np.asarray(qvecs[qid], dtype=np.float64)
        short = pq_adc_search(
            enc, obooks, list(q @ R), k=max(4 * K, n_vecs // 5)
        )
        qlit = F.array(*[F.lit(float(x)) for x in qvecs[qid]])
        top = (
            short.join(emb.select("vec_id", "embedding"), "vec_id")
            .select(
                "vec_id",
                cosine_similarity(F.col("embedding"), qlit).alias("sim"),
            )
            .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
            .limit(K)
        )
        hits = {r.vec_id for r in top.collect()}
        recalls[f"q{qid}"] = len(hits & exact[qid]) / K
    rows.append({
        "study": "ann_recall_100x", "method": "opq_scaled",
        "copies": copies, "n_vecs": n_vecs,
        "recall5_mean": round(sum(recalls.values()) / len(recalls), 3),
        **{k: round(v, 2) for k, v in recalls.items()},
        "build_s": round(build_s, 2),
        "search_s": round(time.perf_counter() - t0, 2),
    })
    rot.unpersist()
    enc.unpersist()
    return rows


def main() -> None:
    from vector_ai_npm_spark.session import get_spark

    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("ann-recall-study")
    for copies in scales:
        for row in study_scale(spark, copies):
            print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

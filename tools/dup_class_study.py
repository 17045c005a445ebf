#!/usr/bin/env python
"""Study: exact-dup classes vs the LSH band join (VERDICT r4 finding #3).

B identical vectors share every LSH bucket, so banding RAW rows emits
~n_tables·C(B,2) candidate pairs per duplicate class before the re-rank
— quadratic wasted work for the web-corpus case where exact duplication
is heavy. The collapse (embedding_router.collapse_exact_duplicates)
bands one representative per distinct value and re-expands pairs after
the re-rank, so the band stage sees each value once and the C(B,2) term
appears only in the OUTPUT (true pairs — output-bound by definition).

Run:  python tools/dup_class_study.py [sf_dir]
Prints one JSON line per planted class size B ∈ {100, 1000}:
  raw band-stage candidates, collapsed band-stage candidates,
  lsh_pairs wall time, output pairs.
"""

from __future__ import annotations

import json
import math
import sys
import time

from pyspark.sql import functions as F


def band_candidates(df, n_tables=8, bits=12, seed=42):
    """Candidate-pair count of the band self-join on df as given."""
    from vector_ai_npm_spark.dedup.embedding_router import sign_lsh_signatures

    dim = df.select(F.min(F.size("embedding"))).first()[0]
    sig = sign_lsh_signatures(dim, n_tables, bits, seed)
    bands = df.select(
        "vec_id",
        "label",
        F.posexplode(sig(F.col("embedding").cast("array<double>"))).alias(
            "lsh_table", "lsh_sig"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return a.join(
        b,
        (F.col("a.lsh_table") == F.col("b.lsh_table"))
        & (F.col("a.lsh_sig") == F.col("b.lsh_sig"))
        & (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sys.path.insert(0, "/root/repo")
    from vector_ai_npm_spark.dedup.embedding_router import (
        collapse_exact_duplicates,
        lsh_pairs,
    )
    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.session import get_spark

    spark = get_spark("dup-class-study")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dup_vec = emb.where("vec_id = 0").select("label", "embedding").first()

    for B in (100, 1000):
        copies = (
            spark.range(B)
            .select(
                (F.col("id") + 1_000_000).alias("vec_id"),
                F.lit(dup_vec["label"]).alias("label"),
                F.lit(dup_vec["embedding"]).cast("array<double>").alias("embedding"),
            )
        )
        corpus = emb.unionByName(copies).persist()
        corpus.count()
        raw = band_candidates(corpus)
        reps, _members = collapse_exact_duplicates(corpus)
        collapsed = band_candidates(
            reps.select("vec_id", "label", "embedding")
        )
        t0 = time.perf_counter()
        out = lsh_pairs(corpus, threshold=0.95, bits=12).count()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "planted_class_B": B,
                    "band_candidates_raw": raw,
                    "band_candidates_collapsed": collapsed,
                    "lsh_pairs_wall_sec": round(wall, 2),
                    "output_pairs": out,
                    "quadratic_term_CB2": B * (B + 1) // 2,
                }
            )
        )
        corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()

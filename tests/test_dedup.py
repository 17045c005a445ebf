"""Near-dup invariants: LSH candidate generation must recall the exact
high-Jaccard pairs (SURVEY §5.2)."""

from __future__ import annotations

from vector_ai_npm_spark import registry


def _pairs(df, a="doc_id_a", b="doc_id_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_pairs_recall_exact_jaccard(spark, sf_smoke):
    exact = _pairs(registry.run("dedup_ngram_jaccard", spark, sf_smoke))
    cand = _pairs(registry.run("dedup_minhash_pairs", spark, sf_smoke))
    if not exact:
        return  # nothing to recall at this SF
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.8, f"banded-minhash recall {recall:.2f} < 0.8"


def test_mllib_lsh_runs_and_orients_pairs(spark, sf_smoke):
    rows = registry.run("dedup_near_lsh", spark, sf_smoke).collect()
    assert all(r.doc_id_a < r.doc_id_b for r in rows)
    assert all(0.0 <= r.jaccard_dist <= 0.6 for r in rows)


def test_exact_dedup_flags_injected_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other text")], ["doc_id", "text"]
    )
    from pyspark.sql import Window, functions as F

    h = F.md5("text")
    keeper = F.min("doc_id").over(Window.partitionBy(h))
    out = {r.doc_id: r.is_dup for r in df.select(
        "doc_id", (F.col("doc_id") != keeper).alias("is_dup")).collect()}
    assert out == {1: False, 2: True, 3: False}

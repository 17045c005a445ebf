"""Wave 56: IVF-RQ two-stage index invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table

SF = "/root/testdata/sf0.001"


def _built(spark):
    from vector_ai_npm_spark.retrieval.rq import build_ivfrq_index

    emb = load_table(spark, SF, "embeddings")
    idx, cents, books, counts = build_ivfrq_index(
        emb, nlist=4, nstages=4, ksub=16
    )
    return emb, idx.localCheckpoint(eager=True), cents, books, counts


def test_index_covers_store_and_manifest_agrees(spark):
    emb, idx, cents, books, counts = _built(spark)
    n = emb.count()
    assert idx.count() == n
    assert sum(counts.values()) == n
    got = {r.cell_id: r.n for r in idx.groupBy("cell_id")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == counts
    assert set(counts) == set(cents) and len(cents) == 4


def test_full_probe_with_full_shortlist_equals_exact(spark):
    """With every cell probed AND the shortlist opened to the whole
    store, the ADC stage cannot drop anyone — the exact re-rank must
    reproduce brute force position-for-position (the lossless-
    composition gate: any mismatch is a plumbing bug, not ADC loss)."""
    from vector_ai_npm_spark.retrieval.rq import ivfrq_search_index
    from vector_ai_npm_spark.retrieval.search import similarity_join

    emb, idx, cents, books, counts = _built(spark)
    n = emb.count()
    queries = emb.where(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    exact = similarity_join(queries, emb, k=5, threshold=0.0)
    want = {(r.q_vec_id, r.rank): r.vec_id for r in exact.collect()}
    for qid in (0, 7):
        qvec = list(
            emb.where(F.col("vec_id") == qid).select("embedding").first()[0]
        )
        got = ivfrq_search_index(
            idx, cents, books, emb, qvec, k=5, nprobe=4,
            shortlist=n, cell_counts=counts,
        ).collect()
        for r in got:
            assert want[(qid, r.rank)] == r.vec_id


def test_probed_scaled_shortlist_from_manifest(spark):
    """The default shortlist derives from the build-time manifest (no
    extra Spark action): max(4k, probed/5)."""
    emb, idx, cents, books, counts = _built(spark)
    import numpy as np

    qvec = np.asarray(
        list(emb.where(F.col("vec_id") == 0).select("embedding").first()[0]),
        dtype=np.float64,
    )
    order = sorted(
        cents, key=lambda c: float(((qvec - cents[c]) ** 2).sum())
    )[:2]
    probed = sum(counts[c] for c in order)
    assert max(4 * 5, probed // 5) >= 20  # the rule's floor is 4k

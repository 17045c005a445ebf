"""Wave-34: binary quantization, late interaction, top-k coverage —
checked against independent numpy references."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


def _vectors(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    return {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}


def _cos(a, b):
    return float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))


def test_binary_codes_and_hamming_rerank(spark, sf_oracle):
    vecs = _vectors(spark, sf_oracle)
    got = registry.run("vector_quantize_binary", spark, sf_oracle).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_vec_id, []).append(r)
    assert set(by_q) == {0, 7, 42}
    for qid, rows in by_q.items():
        q = vecs[qid]
        qbits = q > 0
        ham = sorted(
            (int(np.count_nonzero((v > 0) != qbits)), vid)
            for vid, v in vecs.items()
        )
        short = ham[:32]
        rer = sorted(
            ((-_cos(vecs[vid], q), vid) for _, vid in short),
        )[:5]
        want = [vid for _, vid in rer]
        rows.sort(key=lambda r: r.rank)
        assert [r.vec_id for r in rows] == want, qid
        # self is Hamming-0 and therefore rank 1 after exact re-rank
        assert rows[0].vec_id == qid and rows[0].hamming == 0
        hmap = dict((vid, h) for h, vid in ham)
        for r in rows:
            assert r.hamming == hmap[r.vec_id]


def test_late_interaction_matches_numpy_maxsim(spark, sf_oracle):
    vecs = _vectors(spark, sf_oracle)
    got = registry.run(
        "retrieval_late_interaction", spark, sf_oracle
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_vec_id, []).append(r)
    for qid, rows in by_q.items():
        q = vecs[qid]
        qs = [q[i * 16 : (i + 1) * 16] for i in range(4)]

        def maxsim(v):
            ds = [v[j * 16 : (j + 1) * 16] for j in range(4)]
            return sum(max(_cos(dj, qi) for dj in ds) for qi in qs)

        scored = sorted(
            ((-maxsim(v), vid) for vid, v in vecs.items())
        )[:3]
        rows.sort(key=lambda r: r.rank)
        assert [r.vec_id for r in rows] == [vid for _, vid in scored], qid
        # self-query: every sub-vector matches itself → score == 4
        assert rows[0].vec_id == qid
        assert abs(rows[0].score - 4.0) < 1e-9


def test_topk_coverage_consistency(spark, sf_oracle):
    vecs = _vectors(spark, sf_oracle)
    got = registry.run(
        "retrieval_topk_coverage", spark, sf_oracle
    ).collect()[0]
    probes = (0, 7, 42, 100, 200, 300, 400)
    retrieved = []
    for qid in probes:
        q = vecs[qid]
        top = sorted(((-_cos(v, q), vid) for vid, v in vecs.items()))[:5]
        retrieved += [vid for _, vid in top]
    assert got.n_queries == len(probes)
    assert got.n_slots == 5 * len(probes)
    assert got.n_distinct_retrieved == len(set(retrieved))
    assert got.catalog_n == len(vecs)
    assert got.coverage == len(set(retrieved)) / len(vecs)
    from collections import Counter

    assert got.top_item_hits == Counter(retrieved).most_common(1)[0][1]

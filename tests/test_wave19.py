"""Wave-19 operators: retrieval MAP, binaryFile source, local
clustering coefficient, Spearman rank correlation."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


def test_map_matches_fraction_reference(spark, sf_oracle):
    """Re-derive AP@10 with Fractions from the exact cosine ranking."""
    from vector_ai_npm_spark.functions.vectors import cosine_similarity
    from vector_ai_npm_spark.retrieval.eval_map import _K, _L, _QUERY_IDS

    emb = load_table(spark, sf_oracle, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    got = {r.q_vec_id: r for r in registry.run(
        "retrieval_eval_map", spark, sf_oracle
    ).collect()}
    assert set(got) == set(_QUERY_IDS)
    for qid in _QUERY_IDS:
        q = emb.where(F.col("vec_id") == qid).first()
        cand = (
            emb.where(F.col("vec_id") != qid)
            .select(
                "vec_id",
                "label",
                cosine_similarity(
                    F.col("emb"), F.array(*[F.lit(float(x)) for x in q.emb])
                ).alias("sim"),
            )
            .collect()
        )
        cand.sort(key=lambda r: (-r.sim, r.vec_id))
        rels = [1 if r.label == q.label else 0 for r in cand]
        n_rel = sum(rels)
        ap = Fraction(0)
        hits = 0
        for k, rel in enumerate(rels[:_K], start=1):
            hits += rel
            if rel:
                ap += Fraction(hits, k)
        ap /= min(n_rel, _K)
        r = got[qid]
        assert r.n_rel == n_rel
        assert Fraction(r.ap_num, r.ap_den) == ap
        assert 0.0 <= r.ap_at_k <= 1.0
        assert r.ap_den == _L * min(n_rel, _K)


def test_scan_binary_files_roundtrip(spark, sf_oracle):
    """Files written from documents read back byte-identically through
    the binaryFile source."""
    import hashlib

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_oracle, "documents").collect()
    }
    rows = registry.run("scan_binary_files", spark, sf_oracle).collect()
    assert len(rows) == len(docs)
    for r in rows:
        did = int(r.file_name[len("doc_"):-len(".txt")])
        text = docs[did]
        assert r.n_bytes == len(text.encode("utf-8"))
        assert r.content_md5 == hashlib.md5(text.encode("utf-8")).hexdigest()


def test_clustering_coefficient_matches_python(spark, sf_oracle):
    from vector_ai_npm_spark.operators.graph_ops import copurchase_edges

    edges = {
        (r.src, r.dst)
        for r in copurchase_edges(spark, sf_oracle)
        .select("src", "dst")
        .collect()
    }
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    got = {r.node: r for r in registry.run(
        "graph_clustering_coefficient", spark, sf_oracle
    ).collect()}
    assert set(got) == set(nbrs)
    for v, ns in nbrs.items():
        tri = sum(
            1
            for u in ns
            for w in ns
            if u < w and (min(u, w), max(u, w)) in edges
        )
        r = got[v]
        assert (r.degree, r.n_triangles) == (len(ns), tri), v
        if len(ns) >= 2:
            assert r.cc == 2 * tri / (len(ns) * (len(ns) - 1))
            assert 0.0 <= r.cc <= 1.0
        else:
            assert r.cc is None


def test_spearman_matches_scipy_free_reference(spark, sf_oracle):
    """Midrank Pearson re-derivation (no scipy in the container)."""
    ev = load_table(spark, sf_oracle, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5)).alias("spend"),
        F.count(F.lit(1)).alias("n_events"),
    ).collect()

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            mid = (i + 1 + j) / 2
            for k in range(i, j):
                ranks[order[k]] = mid
            i = j
        return ranks

    xs = [r.spend for r in per_user]
    ys = [r.n_events for r in per_user]
    rx, ry = midranks(xs), midranks(ys)
    n = len(rx)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    want = num / den
    got = registry.run("eval_spearman_corr", spark, sf_oracle).collect()[0]
    assert got.n == n
    assert abs(got.spearman_rho - want) < 1e-9
    assert -1.0 <= got.spearman_rho <= 1.0

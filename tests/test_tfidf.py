"""Invariant tests for the TF-IDF family (B19+): the integer contract is
oracle-checked; the scored face (engine-divergent ln) is re-derived in
Python here and the ranking checked exactly."""

from __future__ import annotations

import math

from vector_ai_npm_spark import registry


def test_tfidf_scored_matches_python_rederivation(spark, sf_oracle):
    base = {
        (r.doc_id, r.term): (r.tf, r.df, r.n_docs)
        for r in registry.run("text_tfidf", spark, sf_oracle).collect()
    }
    scored = registry.run("text_tfidf_scored", spark, sf_oracle).collect()
    assert scored, "no scored rows"
    for r in scored:
        tf, df, n = base[(r.doc_id, r.term)]
        expect = tf * (math.log((1 + n) / (1 + df)) + 1.0)
        assert abs(r.score - expect) <= 1e-9 * max(1.0, abs(expect)), (
            r.doc_id, r.term, r.score, expect,
        )

    # per-doc ranking: recompute top-5 from the full matrix for a few docs
    docs = sorted({d for d, _ in base})[:10]
    by_doc: dict[int, list[tuple[float, str]]] = {d: [] for d in docs}
    for (d, term), (tf, df, n) in base.items():
        if d in by_doc:
            score = tf * (math.log((1 + n) / (1 + df)) + 1.0)
            by_doc[d].append((-score, term))
    got = {
        d: [r.term for r in sorted(
            (x for x in scored if x.doc_id == d), key=lambda x: x.term_rank
        )]
        for d in docs
    }
    for d in docs:
        expect_terms = [t for _, t in sorted(by_doc[d])[:5]]
        assert got[d] == expect_terms, (d, got[d], expect_terms)


def test_tf_times_df_consistency(spark, sf_oracle):
    """df must equal the number of distinct docs carrying the term, and
    every (doc, term) tf >= 1."""
    rows = registry.run("text_tfidf", spark, sf_oracle).collect()
    docs_per_term: dict[str, set] = {}
    for r in rows:
        assert r.tf >= 1
        docs_per_term.setdefault(r.term, set()).add(r.doc_id)
    for r in rows:
        assert r.df == len(docs_per_term[r.term]), r.term

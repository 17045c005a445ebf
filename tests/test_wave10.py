"""Wave-10 invariants: Kneser-Ney LM, ROUGE-2 candidate verification,
linear attribution, LPA modularity.  Cross-engine value parity is in
test_oracle_parity.py; these pin the semantic properties."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


def _run(spark, name, sf):
    return registry.run(name, spark, sf)


# ------------------------------------------------------------- kneser-ney


def test_kn_probabilities_and_counts(spark, sf_smoke):
    rows = _run(spark, "lm_kneser_ney", sf_smoke).collect()
    from vector_ai_npm_spark.text.queries import _SPARK_TOKS

    expected = {
        r["doc_id"]: r["nb"]
        for r in load_table(spark, sf_smoke, "documents")
        .select(
            "doc_id",
            F.greatest(
                F.expr(f"size({_SPARK_TOKS}) - 1"), F.lit(0)
            ).alias("nb"),
        )
        .collect()
    }
    for r in rows:
        assert r["n_bigrams"] == expected[r["doc_id"]]
        if r["n_bigrams"] == 0:
            assert r["avg_kn_p"] is None
        else:
            assert 0.0 < r["avg_kn_p"] < 1.0


def test_kn_mass_conservation_per_prefix(spark, sf_smoke):
    """Σ_w2 P_KN(w2|w1) over SEEN successors + reserved continuation
    mass for unseen ones must equal 1 exactly (the defining property of
    interpolated KN): sum_seen = 1 − d·N₁₊(w1·)/c(w1·)·(1 − Σ_seen
    P_cont).  Verified by re-deriving the model in pure Python on the
    smoke corpus."""
    from collections import Counter

    from vector_ai_npm_spark.text.kneser_ney import _D

    docs = load_table(spark, sf_smoke, "documents").select("text").collect()
    import re

    c12: Counter = Counter()
    for r in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", r["text"].lower()) if t]
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
    c1: Counter = Counter()
    n1p_fwd: Counter = Counter()
    n1p_bwd: Counter = Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        n1p_fwd[a] += 1
        n1p_bwd[b] += 1
    n_types = len(c12)
    # check the three highest-frequency prefixes
    for w1, _ in c1.most_common(3):
        seen = [
            (c - _D) / c1[w1]
            + _D * n1p_fwd[w1] / c1[w1] * n1p_bwd[w2] / n_types
            for (a, w2), c in c12.items()
            if a == w1
        ]
        cont_seen = sum(
            n1p_bwd[w2] / n_types for (a, w2) in c12 if a == w1
        )
        reserved = _D * n1p_fwd[w1] / c1[w1] * (1.0 - cont_seen)
        assert math.isclose(sum(seen) + reserved, 1.0, rel_tol=1e-9)


# ------------------------------------------------------------------ rouge


def test_rouge2_bounds_and_exact_dup_pairs(spark, sf_smoke):
    rows = _run(spark, "eval_rouge2_candidates", sf_smoke).collect()
    assert rows, "no candidate pairs at smoke scale"
    for r in rows:
        if r["precision_"] is not None:
            assert 0.0 <= r["precision_"] <= 1.0
        if r["recall"] is not None:
            assert 0.0 <= r["recall"] <= 1.0
        assert 0.0 <= r["f1"] <= 1.0
    # re-derive P/R/F1 in pure Python for the first five pairs
    import re
    from collections import Counter

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_smoke, "documents").collect()
    }

    def bigrams(doc_id: int) -> Counter:
        toks = [
            t
            for t in re.split(r"[^a-z0-9]+", texts[doc_id].lower())
            if t
        ]
        return Counter(zip(toks, toks[1:]))

    for r in sorted(rows, key=lambda r: (r["doc_id_a"], r["doc_id_b"]))[:5]:
        ba, bb = bigrams(r["doc_id_a"]), bigrams(r["doc_id_b"])
        overlap = sum((ba & bb).values())
        assert r["overlap"] == overlap, r
        if sum(ba.values()):
            assert math.isclose(
                r["precision_"], overlap / sum(ba.values()), rel_tol=1e-12
            )
        if sum(bb.values()):
            assert math.isclose(
                r["recall"], overlap / sum(bb.values()), rel_tol=1e-12
            )


# ------------------------------------------------------------ attribution


def test_linear_attribution_conserves_revenue(spark, sf_oracle):
    from vector_ai_npm_spark.functions.numeric import dsum

    report = _run(spark, "attribution_linear", sf_oracle)
    credited = report.agg(dsum("credit", "total")).collect()[0]["total"]
    total = (
        load_table(spark, sf_oracle, "events")
        .where(F.col("event_type") == "purchase")
        .agg(dsum("value", "total"))
        .collect()[0]["total"]
    )
    assert math.isclose(credited, total, rel_tol=1e-9)
    channels = {r["channel"] for r in report.select("channel").collect()}
    assert channels <= {"click", "view", "direct"}


# ------------------------------------------------------------- modularity


def test_modularity_global_identities(spark, sf_oracle):
    from vector_ai_npm_spark.operators.graph_ops import _pagerank_sym_cached

    rows = _run(spark, "graph_modularity", sf_oracle).collect()
    sym_n = _pagerank_sym_cached(spark, sf_oracle).count()
    n_nodes = (
        _pagerank_sym_cached(spark, sf_oracle)
        .select("node")
        .distinct()
        .count()
    )
    assert sum(r["n_nodes"] for r in rows) == n_nodes
    assert sum(r["degree_sum"] for r in rows) == sym_n
    assert sum(r["intra_edges"] for r in rows) <= sym_n // 2
    q = sum(r["q_c"] for r in rows)
    assert -0.5 <= q <= 1.0
    # communities detected by LPA on this graph should beat the
    # one-community baseline (Q=0 by definition when all nodes merge)
    assert q > 0.0


# -------------------------------------------------------------- plan gates


def test_wave10_plan_gates(spark, sf_smoke):
    """Checkpoint discipline pins (the ppl_buckets lesson): the shared
    frames truncate to leaves, so the final plans keep exactly the
    irreducible corpus passes — and never a cross product.

    * lm_kneser_ney: ONE Generate (the dbt leg's bigram explode; the
      c12 model table is a checkpoint leaf feeding pre/cont/tot); the
      only NLJ is the broadcast 1-row n_types scalar.
    * eval_rouge2_candidates: ZERO Generates downstream — both the
      candidate pairs and the per-doc bigram-type table enter as
      checkpoint leaves (measured 8 Generates before the discipline).
    """

    def plan(name):
        df = registry.run(name, spark, sf_smoke)
        return df._jdf.queryExecution().executedPlan().toString()

    p = plan("lm_kneser_ney")
    assert p.count("Generate") == 1, p
    assert "CartesianProduct" not in p

    p = plan("eval_rouge2_candidates")
    assert p.count("Generate") == 0, p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p

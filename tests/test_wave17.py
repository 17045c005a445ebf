"""Wave-17 operators: agreement/calibration metrics, link-prediction
Jaccard, daily-count ACF, z-score standardization, negative sampling.
Each query is checked against an independent pure-Python re-derivation
(the registry-wide DuckDB parity lives in test_oracle_parity.py)."""

from __future__ import annotations

import math
from fractions import Fraction

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


def test_mcc_matches_fraction_reference(spark, sf_oracle):
    rows = registry.run("eval_mcc_threshold", spark, sf_oracle).collect()
    assert len(rows) == 9
    for r in rows:
        tp, fp, fn, tn = r.tp, r.fp, r.fn, r.tn
        assert r.mcc_num == tp * tn - fp * fn
        den2 = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
        if den2 > 0:
            want = (tp * tn - fp * fn) / math.sqrt(den2)
            assert r.mcc == want  # bit-exact: same IEEE expression
        else:
            assert r.mcc is None


def test_cohens_kappa_matches_fraction_reference(spark, sf_oracle):
    from vector_ai_npm_spark.operators.curation_dq import vote_expr

    emb = load_table(spark, sf_oracle, "embeddings")
    votes = emb.select(
        vote_expr(0).alias("v0"), vote_expr(1).alias("v1")
    ).collect()
    n = len(votes)
    agree = sum(1 for r in votes if r.v0 == r.v1)
    from collections import Counter

    c0 = Counter(r.v0 for r in votes)
    c1 = Counter(r.v1 for r in votes)
    chance = sum(c0[c] * c1.get(c, 0) for c in c0)
    po = Fraction(agree, n)
    pe = Fraction(chance, n * n)
    want = (po - pe) / (1 - pe)
    got = registry.run("eval_cohens_kappa", spark, sf_oracle).collect()[0]
    assert (got.kappa_num, got.kappa_den) == (
        n * agree - chance,
        n * n - chance,
    )
    assert Fraction(got.kappa_num, got.kappa_den) == want
    assert 0.0 < got.kappa < 1.0  # noisy-but-correlated annotators


def test_ece_equals_weighted_gap_sum(spark, sf_oracle):
    """The exact-integer ECE must equal the textbook n-weighted gap sum
    over the calibration bins (float re-derivation, 1e-12 tol)."""
    bins = registry.run("eval_calibration_bins", spark, sf_oracle).collect()
    n_total = sum(r.n_examples for r in bins)
    want = (
        sum(r.n_examples * abs(r.frac_pos - r.mean_score) for r in bins)
        / n_total
    )
    got = registry.run("eval_ece", spark, sf_oracle).collect()[0]
    assert got.n_bins == len(bins) and got.n_examples == n_total
    assert abs(got.ece - want) < 1e-12
    assert got.ece == got.ece_num / got.ece_den


def test_link_jaccard_matches_python_reference(spark, sf_oracle):
    """Re-derive neighborhood Jaccard from the raw edge list (with the
    same pivot cap) and pin the full top-50 ranking."""
    from vector_ai_npm_spark.operators.graph_ops import copurchase_edges
    from vector_ai_npm_spark.operators.linkpred_ops import (
        _PIVOT_CAP,
        _TOP_K,
    )

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
    common: dict[tuple[int, int], int] = {}
    for p, ns in nbrs.items():
        if len(ns) > _PIVOT_CAP:
            continue
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1 :]:
                common[(u, v)] = common.get((u, v), 0) + 1
    scored = [
        (u, v, c, len(nbrs[u]) + len(nbrs[v]) - c)
        for (u, v), c in common.items()
        if (u, v) not in edges
    ]
    scored.sort(key=lambda t: (-(t[2] / t[3]), t[0], t[1]))
    want = scored[:_TOP_K]
    got = registry.run("graph_link_jaccard", spark, sf_oracle).collect()
    got.sort(key=lambda r: r.rank)
    assert [(r.u, r.v, r.common, r.uni) for r in got] == want
    for r in got:
        assert (r.u, r.v) not in edges
        assert r.jaccard == r.common / r.uni


def test_autocorr_matches_numpy(spark, sf_oracle):
    """Exact-fraction ACF must equal the float mean-centered sample
    autocorrelation over the densified daily series."""
    import numpy as np

    ev = load_table(spark, sf_oracle, "events")
    daily = {
        r.day: r.x
        for r in ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    }
    days = sorted(daily)
    import datetime as dt

    span = (days[-1] - days[0]).days + 1
    x = np.array(
        [
            daily.get(days[0] + dt.timedelta(d), 0)
            for d in range(span)
        ],
        dtype=np.float64,
    )
    y = x - x.mean()
    den = float((y * y).sum())
    got = {r.lag: r for r in registry.run("events_autocorr", spark, sf_oracle).collect()}
    assert set(got) == set(range(1, 8))
    for k in range(1, 8):
        want = float((y[:-k] * y[k:]).sum()) / den
        assert abs(got[k].acf - want) < 1e-9
        assert got[k].acf == got[k].num / got[k].den


def test_standardize_moments(spark, sf_oracle):
    """Per-group z-scores must have mean ~0, var ~1 (ddof=1), and match
    a numpy re-derivation row-wise."""
    import numpy as np

    out = registry.run("feature_standardize", spark, sf_oracle).collect()
    by_g: dict[str, list] = {}
    for r in out:
        by_g.setdefault(r.event_type, []).append(r)
    assert len(by_g) >= 3
    for g, rs in by_g.items():
        c = np.array([r.cents for r in rs], dtype=np.float64)
        z = np.array([r.z for r in rs], dtype=np.float64)
        want = (c - c.mean()) / c.std(ddof=1)
        assert np.abs(z - want).max() < 1e-9, g
        assert abs(z.mean()) < 1e-9
        assert abs(z.std(ddof=1) - 1.0) < 1e-9


def test_negative_sampling_contract(spark, sf_oracle):
    """k negatives per anchor, never the anchor itself, deterministic
    across runs, and ids within the domain."""
    rows = registry.run("sample_negative_uniform", spark, sf_oracle).collect()
    n_vecs = load_table(spark, sf_oracle, "embeddings").count()
    by_anchor: dict[int, list] = {}
    for r in rows:
        assert r.neg_id != r.anchor_id
        assert 0 <= r.neg_id < n_vecs
        assert r.same_label == (r.anchor_label == r.neg_label)
        by_anchor.setdefault(r.anchor_id, []).append(r)
    assert len(by_anchor) == n_vecs
    assert all(len(v) == 3 for v in by_anchor.values())
    again = registry.run("sample_negative_uniform", spark, sf_oracle).collect()
    assert sorted((r.anchor_id, r.slot, r.neg_id) for r in rows) == sorted(
        (r.anchor_id, r.slot, r.neg_id) for r in again
    )

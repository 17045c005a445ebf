"""Wave-18 operators: Krippendorff's alpha, CUSUM drift, Heaps' law,
resource-allocation link scoring, intensity histogram.  Pure-Python
re-derivations; registry-wide DuckDB parity in test_oracle_parity.py."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


def test_krippendorff_alpha_matches_fraction_reference(spark, sf_oracle):
    from collections import Counter

    from vector_ai_npm_spark.operators.curation_dq import _N_ANN, vote_expr

    emb = load_table(spark, sf_oracle, "embeddings")
    votes = []
    for i in range(_N_ANN):
        votes += [
            (r.vec_id, r.v)
            for r in emb.select("vec_id", vote_expr(i).alias("v")).collect()
        ]
    n_items = len({v[0] for v in votes})
    m = _N_ANN
    N = len(votes)
    per_item = Counter()
    for item, v in votes:
        per_item[(item, v)] += 1
    within = sum(c * (m - c) for c in per_item.values())
    marg = Counter(v for _, v in votes)
    between = sum(c * (N - c) for c in marg.values())
    do = Fraction(within, n_items * m * (m - 1))
    de = Fraction(between, N * (N - 1))
    want = 1 - do / de
    got = registry.run("eval_krippendorff_alpha", spark, sf_oracle).collect()[0]
    assert (got.n_items, got.n_votes) == (n_items, N)
    assert Fraction(got.alpha_num, got.alpha_den) == want
    assert 0.0 < got.alpha < 1.0  # noisy-but-correlated annotators
    # with identical marginals expected, alpha ~ kappa family: sanity
    # vs Fleiss computed by the existing query is not required (chance
    # models differ) but alpha must exceed the no-agreement 0 floor.


def test_cusum_matches_python_and_flags_unique_peak(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    daily = sorted(
        (r.day, r.x)
        for r in ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    n = len(daily)
    s = sum(x for _, x in daily)
    cum, want = 0, {}
    for day, x in daily:
        cum += n * x - s
        want[day] = cum
    got = registry.run("events_cusum_drift", spark, sf_oracle).collect()
    assert {r.day: r.cusum_scaled for r in got} == want
    peaks = [r for r in got if r.is_changepoint]
    assert len(peaks) == 1
    peak_abs = max(abs(v) for v in want.values())
    assert abs(peaks[0].cusum_scaled) == peak_abs
    assert peaks[0].day == min(d for d, v in want.items() if abs(v) == peak_abs)
    # full-series CUSUM telescopes to zero at the last day
    assert want[daily[-1][0]] == 0


def test_heaps_law_monotone_and_exact(spark, sf_oracle):
    """V(k) re-derived sequentially; growth must be monotone and
    sublinear in tokens (tokens_per_type non-decreasing late)."""
    from vector_ai_npm_spark.text.queries import _SPARK_TOKS

    docs = load_table(spark, sf_oracle, "documents")
    toks = {
        r.doc_id: r.t
        for r in docs.select(
            "doc_id", F.expr(_SPARK_TOKS).alias("t")
        ).collect()
    }
    ids = sorted(toks)
    n = len(ids)
    got = {r.decile: r for r in registry.run("text_heaps_law", spark, sf_oracle).collect()}
    assert set(got) == set(range(1, 11))
    for d in range(1, 11):
        k = max(1, (n * d) // 10)
        prefix = ids[:k]
        vocab = len({t for i in prefix for t in toks[i]})
        n_tokens = sum(len(toks[i]) for i in prefix)
        r = got[d]
        assert (r.cutoff_doc, r.n_docs_prefix) == (ids[k - 1], k)
        assert (r.n_tokens, r.vocab) == (n_tokens, vocab)
        assert r.tokens_per_type == n_tokens / vocab
    vocabs = [got[d].vocab for d in range(1, 11)]
    assert vocabs == sorted(vocabs)  # monotone growth
    # sublinear: vocabulary grows slower than tokens over the back half
    assert got[10].vocab / got[5].vocab < got[10].n_tokens / got[5].n_tokens


def test_resource_alloc_matches_python_reference(spark, sf_oracle):
    from vector_ai_npm_spark.operators.graph_ops import copurchase_edges
    from vector_ai_npm_spark.operators.linkpred_ops import (
        _PIVOT_CAP,
        _RA_SCALE,
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
    ra: dict[tuple[int, int], int] = {}
    common: dict[tuple[int, int], int] = {}
    for p, ns in nbrs.items():
        if len(ns) > _PIVOT_CAP:
            continue
        term = _RA_SCALE // len(ns)
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1 :]:
                ra[(u, v)] = ra.get((u, v), 0) + term
                common[(u, v)] = common.get((u, v), 0) + 1
    scored = [
        (u, v, common[(u, v)], s)
        for (u, v), s in ra.items()
        if (u, v) not in edges
    ]
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    got = registry.run("graph_link_resource_alloc", spark, sf_oracle).collect()
    got.sort(key=lambda r: r.rank)
    assert [(r.u, r.v, r.common, r.ra_e12) for r in got] == scored[:_TOP_K]


def test_intensity_histogram_counts_all_pixels(spark, sf_oracle):
    """Bins partition [0,256): counts sum to the corpus pixel count and
    match a driver-side re-decode."""
    import numpy as np

    from vector_ai_npm_spark.multimodal.binary import (
        decode_pixels,
        synth_ppm_media,
    )

    media = synth_ppm_media(load_table(spark, sf_oracle, "documents"))
    want = np.zeros(8, dtype=np.int64)
    total = 0
    for r in media.collect():
        _, _, body = decode_pixels(bytes(r.payload))
        v = np.frombuffer(body, dtype=np.uint8)
        want += np.bincount(v >> 5, minlength=8)
        total += len(v)
    got = {r.bin: r for r in registry.run(
        "multimodal_intensity_histogram", spark, sf_oracle
    ).collect()}
    assert set(got) == set(range(8))
    assert [got[b].n_px for b in range(8)] == want.tolist()
    assert sum(r.n_px for r in got.values()) == total
    for b in range(8):
        assert got[b].frac == got[b].n_px / total

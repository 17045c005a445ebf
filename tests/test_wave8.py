"""Invariant tests for the wave-8 operators (KS drift, C4 line dedup,
BM25).  Cross-engine value equality is covered by test_oracle_parity;
these re-derive the statistics sequentially in Python and pin the
semantic properties the oracle can't see."""

from __future__ import annotations

import math
from fractions import Fraction

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


# --------------------------------------------------------------------------
# drift_ks_arms
# --------------------------------------------------------------------------


def test_ks_matches_exact_sequential_reference(spark, sf_oracle):
    """The distributed two-level KS equals an exact Fraction-arithmetic
    sequential computation over the same rows."""
    from vector_ai_npm_spark.operators.experiment_ops import _SPARK_ARM

    p = (
        load_table(spark, sf_oracle, "events")
        .where(F.col("event_type") == "purchase")
        .select("value", F.expr(_SPARK_ARM).alias("arm"))
        .collect()
    )
    a = sorted(r["value"] for r in p if r["arm"] == "control")
    b = sorted(r["value"] for r in p if r["arm"] == "treatment")
    xs = sorted(set(a) | set(b))
    import bisect

    d = max(
        abs(
            Fraction(bisect.bisect_right(a, x), len(a))
            - Fraction(bisect.bisect_right(b, x), len(b))
        )
        for x in xs
    )
    row = registry.run("drift_ks_arms", spark, sf_oracle).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert Fraction(int(row["ks_num"]), int(row["ks_den"])) == d
    assert 0.0 <= row["ks_stat"] <= 1.0


# --------------------------------------------------------------------------
# curate_line_dedup
# --------------------------------------------------------------------------


def test_line_dedup_bounds_and_removal(spark, sf_oracle):
    out = registry.run("curate_line_dedup", spark, sf_oracle)
    rows = out.collect()
    n_docs = load_table(spark, sf_oracle, "documents").count()
    assert len(rows) == n_docs
    assert all(0 <= r["n_kept"] <= r["n_lines"] for r in rows)
    # the planted near-dup docs guarantee repeated segments exist
    assert sum(r["n_lines"] - r["n_kept"] for r in rows) > 0
    for r in rows:
        assert (r["clean_text"] == "") == (r["n_kept"] == 0)


def test_line_dedup_removes_exactly_frequent_lines(spark, sf_oracle):
    """Sequential reference: re-segment in Python, count corpus line
    frequencies, and check every doc's kept-line sequence."""
    import re

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_oracle, "documents").collect()
    }
    seg_by_doc: dict[int, list[str]] = {}
    freq: dict[str, int] = {}
    for did, text in docs.items():
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        lines = [
            " ".join(toks[i : i + 10]) for i in range(0, len(toks), 10)
        ]
        seg_by_doc[did] = lines
        for ln in lines:
            freq[ln] = freq.get(ln, 0) + 1
    expected = {
        did: " ".join(ln for ln in lines if freq[ln] < 3)
        for did, lines in seg_by_doc.items()
    }
    got = {
        r["doc_id"]: r["clean_text"]
        for r in registry.run("curate_line_dedup", spark, sf_oracle).collect()
    }
    assert got == expected


# --------------------------------------------------------------------------
# text_bm25 / text_bm25_topk
# --------------------------------------------------------------------------


def test_bm25_topk_matches_python_rederivation(spark, sf_oracle):
    from vector_ai_npm_spark.text.bm25 import _TOP_K, bm25_reference

    base = registry.run("text_bm25", spark, sf_oracle).collect()
    assert base, "query terms must match fixture vocabulary"
    r0 = base[0]
    n_docs = (r0["idf_num"] - 1) // 2 + r0["df"]
    total_len = r0["tf_sat_num"] // (22 * r0["tf"])
    scores = bm25_reference(base, n_docs, total_len)
    got = registry.run("text_bm25_topk", spark, sf_oracle).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        want = sorted(
            (k[1] for k in scores if k[0] == q),
            key=lambda d: (-scores[(q, d)], d),
        )[:_TOP_K]
        assert [r["doc_id"] for r in rs] == want
        for r in rs:
            assert math.isclose(
                r["score"], scores[(q, r["doc_id"])], rel_tol=1e-9
            )


def test_bm25_topk_contract_matches_exact_fraction_reference(spark, sf_oracle):
    """The hash-checkable contract face ranks on Σ_t floor(1e12·
    idf_t·tf_sat_t) with the RATIONAL idf — re-derive that key with
    Python's exact integers and pin ranking + score bit-for-bit."""
    from vector_ai_npm_spark.text.bm25 import _TOP_K

    base = registry.run("text_bm25", spark, sf_oracle).collect()
    scores: dict[tuple[int, int], int] = {}
    for r in base:
        part = (r["idf_num"] * r["tf_sat_num"] * 10**12) // (
            r["idf_den"] * r["tf_sat_den"]
        )
        key = (r["query_id"], r["doc_id"])
        scores[key] = scores.get(key, 0) + part
    got = registry.run("text_bm25_topk_contract", spark, sf_oracle).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert by_q, "query terms must match fixture vocabulary"
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        want = sorted(
            (k[1] for k in scores if k[0] == q),
            key=lambda d: (-scores[(q, d)], d),
        )[:_TOP_K]
        assert [r["doc_id"] for r in rs] == want
        for r in rs:
            assert r["score_e12"] == scores[(q, r["doc_id"])]


def test_bm25_topk_contract_oracle_parity(spark, sf_oracle):
    from oracle_harness import compare

    sql = registry.all_oracles()["text_bm25_topk_contract"]
    assert compare(spark, "text_bm25_topk_contract", sql, sf_oracle) == []


def test_bm25_saturation_properties(spark, sf_oracle):
    """tf_sat is monotone in tf, bounded by k1+1, and equals 1.0 at
    (tf=1, dl=avgdl) by construction."""
    rows = registry.run("text_bm25", spark, sf_oracle).collect()
    for r in rows:
        assert 0.0 < r["tf_sat"] < 2.2
        assert r["tf_sat_num"] > 0 and r["tf_sat_den"] > 0
        assert r["idf_num"] > 0 and r["idf_den"] > 0


# --------------------------------------------------------------------------
# eval_pass_at_k
# --------------------------------------------------------------------------


def test_pass_at_k_matches_comb_reference(spark, sf_oracle):
    """The k-factor product estimator equals the exact C(n-c,k)/C(n,k)
    formulation (Fraction arithmetic) to double precision."""
    from math import comb

    ev = load_table(spark, sf_oracle, "events").collect()
    per: dict[int, list[int]] = {}
    for r in ev:
        n_c = per.setdefault(r["user_id"], [0, 0])
        n_c[0] += 1
        n_c[1] += r["event_type"] == "purchase"
    rows = {r["k"]: r for r in
            registry.run("eval_pass_at_k", spark, sf_oracle).collect()}
    assert set(rows) == {1, 5}
    for k, row in rows.items():
        tasks = [(n, c) for n, c in per.values() if n >= k]
        assert row["n_tasks"] == len(tasks)
        mean = sum(
            1.0 - comb(n - c, k) / comb(n, k) if n - c >= k else 1.0
            for n, c in tasks
        ) / len(tasks)
        # dsum folds each pass_k through DECIMAL(30,8): the mean matches
        # the float reference to the per-row quantization (0.5e-8)
        assert math.isclose(row["mean_pass_at_k"], mean, abs_tol=1e-8)
        assert 0.0 <= row["mean_pass_at_k"] <= 1.0
    # more draws can only help: pass@5 >= pass@1 on the shared tasks
    assert rows[5]["mean_pass_at_k"] >= rows[1]["mean_pass_at_k"] - 1e-12


# --------------------------------------------------------------------------
# curate_ppl_buckets
# --------------------------------------------------------------------------


def test_ppl_buckets_match_sequential_ntile(spark, sf_oracle):
    """The grouped two-level rank equals a sequential per-language
    ntile(3) over (score DESC, doc_id ASC)."""
    got = {
        r["doc_id"]: (r["lang"], r["avg_bigram_p"], r["tile"], r["bucket"])
        for r in registry.run("curate_ppl_buckets", spark, sf_oracle).collect()
    }
    by_lang: dict[str, list] = {}
    for did, (lang, score, _, _) in got.items():
        by_lang.setdefault(lang, []).append((did, score))
    for lang, rows in by_lang.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        n = len(rows)
        big, size_big, size_small = n % 3, n // 3 + 1, n // 3
        for i, (did, _) in enumerate(rows, start=1):
            if i <= big * size_big:
                tile = (i - 1) // size_big + 1
            else:
                tile = big + 1 + (i - 1 - big * size_big) // size_small
            assert got[did][2] == tile, (lang, did)
            assert got[did][3] == {1: "head", 2: "middle", 3: "tail"}[tile]


# --------------------------------------------------------------------------
# dq_l_diversity
# --------------------------------------------------------------------------


def test_l_diversity_matches_python(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events").collect()
    cells: dict[tuple, set] = {}
    sizes: dict[tuple, int] = {}
    for r in ev:
        key = (r["event_type"], r["ts"].date())
        cells.setdefault(key, set()).add(r["user_id"])
        sizes[key] = sizes.get(key, 0) + 1
    got = registry.run("dq_l_diversity", spark, sf_oracle).collect()
    assert len(got) == len(cells)
    for r in got:
        key = (r["event_type"], r["day"])
        assert r["l_distinct"] == len(cells[key])
        assert r["group_n"] == sizes[key]
        assert r["at_risk"] == (len(cells[key]) < 5)


# --------------------------------------------------------------------------
# events_growth_accounting / window_twap / dq_freshness
# --------------------------------------------------------------------------


def test_growth_accounting_identity(spark, sf_oracle):
    """active(d) = new+retained+resurrected, and churned(d) =
    active(d-1) − retained(d) — the accounting identity, re-derived
    from the raw (user, day) activity sets."""
    from datetime import timedelta

    ev = load_table(spark, sf_oracle, "events").collect()
    active: dict = {}
    for r in ev:
        active.setdefault(r["ts"].date(), set()).add(r["user_id"])
    rows = {r["day"]: r for r in
            registry.run("events_growth_accounting", spark, sf_oracle).collect()}
    days = sorted(active)
    for d in days:
        r = rows[d]
        assert (
            r["new_users"] + r["retained_users"] + r["resurrected_users"]
            == len(active[d])
        ), d
        prev = active.get(d - timedelta(days=1), set())
        assert r["retained_users"] == len(active[d] & prev), d
        assert r["churned_users"] == len(prev - active[d]), d
    # day 1: everyone is new, nobody churned
    r0 = rows[days[0]]
    assert r0["new_users"] == len(active[days[0]])
    assert r0["retained_users"] == r0["resurrected_users"] == 0
    assert r0["churned_users"] == 0


def test_twap_matches_python(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events").collect()
    by_ud: dict = {}
    for r in ev:
        by_ud.setdefault((r["user_id"], r["ts"].date()), []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    got = {(r["user_id"], r["day"]): r for r in
           registry.run("window_twap", spark, sf_oracle).collect()}
    n_multi = sum(1 for v in by_ud.values() if len(v) >= 2)
    assert len(got) == n_multi
    for key, evs in by_ud.items():
        if len(evs) < 2:
            assert key not in got
            continue
        evs.sort(key=lambda t: (t[0], t[1]))
        num = den = 0.0
        for (t0, _, v), (t1, _, _) in zip(evs, evs[1:]):
            dt = (t1 - t0).total_seconds()
            num += v * dt
            den += dt
        r = got[key]
        assert r["n_events"] == len(evs)
        assert math.isclose(r["twap"], num / den, rel_tol=1e-6)
        lo = min(v for _, _, v in evs[:-1])
        hi = max(v for _, _, v in evs[:-1])
        assert lo - 1e-9 <= r["twap"] <= hi + 1e-9


def test_freshness_watermark_anchor(spark, sf_oracle):
    rows = registry.run("dq_freshness", spark, sf_oracle).collect()
    assert len(rows) == 5  # the five fixture event types
    lags = {r["event_type"]: r["lag_seconds"] for r in rows}
    assert min(lags.values()) == 0  # the watermark type itself
    for r in rows:
        assert r["lag_seconds"] >= 0
        assert r["stale"] == (r["lag_seconds"] > 3600)


def test_trend_ols_matches_numpy(spark, sf_oracle):
    """Distributed closed-form OLS equals numpy's lstsq per group."""
    import numpy as np

    ev = load_table(spark, sf_oracle, "events").collect()
    daily: dict = {}
    for r in ev:
        x = (r["ts"].date() - __import__("datetime").date(2024, 1, 1)).days
        daily[(r["event_type"], x)] = daily.get((r["event_type"], x), 0.0) + r["value"]
    rows = registry.run("events_trend_ols", spark, sf_oracle).collect()
    for r in rows:
        pts = sorted(
            (x, y) for (et, x), y in daily.items() if et == r["event_type"]
        )
        assert r["n"] == len(pts)
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        a = np.vstack([xs, np.ones_like(xs)]).T
        slope, intercept = np.linalg.lstsq(a, ys, rcond=None)[0]
        assert math.isclose(r["slope"], slope, rel_tol=1e-6, abs_tol=1e-6)
        assert math.isclose(r["intercept"], intercept, rel_tol=1e-6)

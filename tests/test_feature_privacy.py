"""Wave-14 feature/threshold/privacy operators: independent
brute-force cross-checks (the test_eval_metrics.py discipline — naive
reference implementations sharing no algorithm with the Spark faces).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from fractions import Fraction

import duckdb

from conftest import SF_SMOKE as SF  # single source for the fixture path


def _md5_mod(key: str, mod: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % mod


def test_rank_normalize_matches_sorted_midranks(spark, sf_smoke):
    from vector_ai_npm_spark.operators.feature_ops import (
        feature_rank_normalize,
    )

    rows = duckdb.sql(
        f"SELECT o_orderkey, CAST(FLOOR(o_totalprice*100+0.5) AS BIGINT) "
        f"FROM '{SF}/orders.parquet'"
    ).fetchall()
    n = len(rows)
    ordered = sorted(c for _, c in rows)
    # brute-force mid-rank: mean of the 1-based positions of each value
    first = {}
    cnt: Counter = Counter()
    for i, c in enumerate(ordered):
        first.setdefault(c, i + 1)
        cnt[c] += 1
    expected = {
        k: (first[c] + (first[c] + cnt[c] - 1)) / (2.0 * n)
        for k, c in rows
    }
    got = {r.o_orderkey: r.pct_rank for r in
           feature_rank_normalize(spark, sf_smoke).collect()}
    assert len(got) == n
    for k, e in expected.items():
        assert math.isclose(got[k], e, rel_tol=1e-12), k
    # mid-rank range is (0, 1]: a unique max gets exactly n/n = 1.0
    assert all(0.0 < v <= 1.0 for v in got.values())
    # mean of mid-rank percentiles is exactly (n+1)/(2n)
    assert math.isclose(sum(got.values()) / n, (n + 1) / (2.0 * n),
                        rel_tol=1e-9)


def test_confusion_thresholds_match_brute_force(spark, sf_smoke):
    from vector_ai_npm_spark.operators.feature_ops import (
        eval_confusion_threshold,
    )

    items = duckdb.sql(
        f"SELECT vec_id, label FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    scored = [
        (
            1 if label < 5 else 0,
            _md5_mod(f"{vec_id}#cal", 600) + (350 if label < 5 else 50),
        )
        for vec_id, label in items
    ]
    p_all = sum(p for p, _ in scored)
    n_all = len(scored)
    got = {r.threshold: r for r in
           eval_confusion_threshold(spark, sf_smoke).collect()}
    assert set(got) == set(range(100, 1000, 100))
    prev_recall = 2.0
    for t in range(100, 1000, 100):
        tp = sum(1 for p, s in scored if p == 1 and s >= t)
        fp = sum(1 for p, s in scored if p == 0 and s >= t)
        r = got[t]
        assert (r.tp, r.fp) == (tp, fp)
        assert (r.fn, r.tn) == (p_all - tp, n_all - p_all - fp)
        if tp + fp:
            assert math.isclose(r.precision, tp / (tp + fp), rel_tol=1e-12)
        assert math.isclose(r.recall, tp / p_all, rel_tol=1e-12)
        assert math.isclose(
            r.f1, 2 * tp / (2 * tp + fp + (p_all - tp)), rel_tol=1e-12
        )
        assert r.recall <= prev_recall  # threshold up -> recall down
        prev_recall = r.recall


def test_t_closeness_matches_fraction_emd(spark, sf_smoke):
    from vector_ai_npm_spark.operators.privacy_ops import dq_t_closeness

    rows = duckdb.sql(
        f"SELECT lang, source, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    m = 10
    bands = [(lg, src, min(nc // 64, m - 1)) for lg, src, nc in rows]
    n = len(bands)
    glob: Counter = Counter(b for _, _, b in bands)
    by_group: dict[tuple, Counter] = defaultdict(Counter)
    for lg, src, b in bands:
        by_group[(lg, src)][b] += 1
    got = {(r.lang, r.source): r for r in
           dq_t_closeness(spark, sf_smoke).collect()}
    assert set(got) == set(by_group)
    for key, cnts in by_group.items():
        ng = sum(cnts.values())
        cum_g = cum_q = 0
        emd = Fraction(0)
        for j in range(m - 1):  # last CDF point always cancels
            cum_g += cnts.get(j, 0)
            cum_q += glob.get(j, 0)
            emd += abs(Fraction(cum_g, ng) - Fraction(cum_q, n))
        emd /= m - 1
        r = got[key]
        assert r.group_n == ng
        assert math.isclose(r.t_emd, float(emd), rel_tol=1e-12)
        assert r.at_risk == (emd > Fraction(2, 10))
        assert 0 <= r.t_emd <= 1


def test_isotonic_matches_pool_adjacent_violators(spark, sf_smoke):
    from vector_ai_npm_spark.operators.feature_ops import (
        eval_calibration_isotonic,
    )

    items = duckdb.sql(
        f"SELECT vec_id, label FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    bins: dict[int, list[int]] = defaultdict(lambda: [0, 0])  # n, p
    for vec_id, label in items:
        pos = 1 if label < 5 else 0
        s = _md5_mod(f"{vec_id}#cal", 600) + (350 if pos else 50)
        acc = bins[s // 100]
        acc[0] += 1
        acc[1] += pos
    # classic sequential PAV over bins ordered by id — shares NO
    # algorithm with the Spark face's minimax-identity formulation
    blocks = []  # (n, p) pools
    for b in sorted(bins):
        n, p = bins[b]
        blocks.append([n, p, [b]])
        while len(blocks) >= 2 and (
            blocks[-2][1] * blocks[-1][0] > blocks[-1][1] * blocks[-2][0]
        ):  # prev rate > next rate, compared as exact cross-products
            n2, p2, ids2 = blocks.pop()
            blocks[-1][0] += n2
            blocks[-1][1] += p2
            blocks[-1][2].extend(ids2)
    expected = {}
    for n, p, ids in blocks:
        for b in ids:
            expected[b] = (p, n)

    got = {r.bin: r for r in
           eval_calibration_isotonic(spark, sf_smoke).collect()}
    assert set(got) == set(bins)
    prev = -1.0
    for b in sorted(got):
        r = got[b]
        p, n = expected[b]
        assert math.isclose(r.iso_rate, p / n, rel_tol=1e-12), b
        assert (r.n_examples, ) == (bins[b][0], )
        assert math.isclose(r.frac_pos, bins[b][1] / bins[b][0],
                            rel_tol=1e-12)
        assert r.iso_rate >= prev - 1e-15  # monotone non-decreasing
        prev = r.iso_rate


def test_average_precision_matches_sklearn_style_reference(spark, sf_smoke):
    from vector_ai_npm_spark.operators.feature_ops import (
        eval_average_precision,
    )

    items = duckdb.sql(
        f"SELECT vec_id, label FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    scored = sorted(
        (
            _md5_mod(f"{vec_id}#cal", 600) + (350 if label < 5 else 50),
            1 if label < 5 else 0,
        )
        for vec_id, label in items
    )
    p_all, n_all = sum(p for _, p in scored), len(scored)
    # step-interpolated AP, iterating distinct scores descending
    ap = 0.0
    c_all = c_pos = 0
    i = len(scored) - 1
    while i >= 0:
        s = scored[i][0]
        j = i
        while j >= 0 and scored[j][0] == s:
            j -= 1
        n = i - j
        npos = sum(p for _, p in scored[j + 1 : i + 1])
        c_all += n
        c_pos += npos
        ap += (npos / p_all) * (c_pos / c_all)
        i = j

    row = eval_average_precision(spark, sf_smoke).collect()[0]
    assert (row.n_examples, row.n_pos) == (n_all, p_all)
    assert math.isclose(row.prevalence, p_all / n_all, rel_tol=1e-12)
    assert math.isclose(row.average_precision, ap, rel_tol=1e-9)
    # the score is informative: AP must clearly beat the prevalence
    # baseline of a random ranker
    assert row.average_precision > row.prevalence + 0.1


def test_brier_score_matches_brute_force(spark, sf_smoke):
    from vector_ai_npm_spark.operators.feature_ops import eval_brier_score

    items = duckdb.sql(
        f"SELECT vec_id, label FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    se = n_pos = 0
    for vec_id, label in items:
        pos = 1 if label < 5 else 0
        s = _md5_mod(f"{vec_id}#cal", 600) + (350 if pos else 50)
        se += (s - 1000 * pos) ** 2
        n_pos += pos
    n = len(items)
    row = eval_brier_score(spark, sf_smoke).collect()[0]
    assert (row.n_examples, row.n_pos) == (n, n_pos)
    assert math.isclose(row.brier_score, se / n / 1e6, rel_tol=1e-12)
    prev = n_pos / n
    assert math.isclose(row.brier_baseline, prev * (1 - prev), rel_tol=1e-12)
    # the fixture's model is informative: it must beat the no-skill
    # base-rate predictor
    assert row.brier_score < row.brier_baseline

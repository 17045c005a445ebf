"""Wave-13 eval/feature metrics: independent brute-force cross-checks.

The DuckDB oracle parity sweep (test_oracle_parity.py) already pins
cross-engine equality; these tests pin CORRECTNESS OF THE MATH against
naive reference implementations that share no algorithm with the Spark
faces — O(n^2) pair counting for AUC, per-row dict recomputation for
LOO encoding and Fleiss' kappa, hashlib-reconstructed fixtures for the
deterministic md5 synthesis.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import duckdb

from conftest import SF_SMOKE as SF  # single source for the fixture path


def _md5_mod(key: str, mod: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % mod


def test_auc_matches_brute_force_pair_count(spark, sf_smoke):
    from vector_ai_npm_spark.operators.eval_metrics import eval_auc_rank

    per_user = duckdb.sql(
        f"""
        SELECT SUM(CAST(FLOOR(value*100+0.5) AS BIGINT)) AS cents,
               CASE WHEN COUNT(CASE WHEN event_type='purchase' THEN 1 END)*5
                         > COUNT(*) THEN 1 ELSE 0 END AS pos
        FROM '{SF}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    pos = [c for c, p in per_user if p == 1]
    neg = [c for c, p in per_user if p == 0]
    u2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    expected = u2 / (2.0 * len(pos) * len(neg))

    row = eval_auc_rank(spark, sf_smoke).collect()[0]
    assert row.n_users == len(per_user)
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    assert row.auc == expected  # same integers, same final IEEE division
    assert 0.0 <= row.auc <= 1.0


def test_loo_encoding_excludes_self(spark, sf_smoke):
    from vector_ai_npm_spark.operators.eval_metrics import (
        feature_target_encode_loo,
    )

    rows = duckdb.sql(
        f"SELECT o_orderkey, o_orderpriority, o_totalprice "
        f"FROM '{SF}/orders.parquet'"
    ).fetchall()
    # exact decimal arithmetic via integer 10^-4 units
    units = {k: round(p * 10_000) for k, _, p in rows}
    by_cat: dict[str, list[int]] = defaultdict(list)
    for k, c, _ in rows:
        by_cat[c].append(k)

    got = {
        r.o_orderkey: r
        for r in feature_target_encode_loo(spark, sf_smoke).collect()
    }
    assert len(got) == len(rows)
    for k, c, _ in rows:
        n = len(by_cat[c])
        loo_units = sum(units[j] for j in by_cat[c]) - units[k]
        expected = (loo_units / 10_000.0) / (n - 1)
        assert got[k].n_cat == n
        assert math.isclose(got[k].loo_enc, expected, rel_tol=1e-12)
        # leakage check: the encoding moves when this row's own price is
        # extreme — i.e. it must NOT equal the plain category mean
        cat_mean = (sum(units[j] for j in by_cat[c]) / 10_000.0) / n
        if abs(units[k] / 10_000.0 - cat_mean) > 1e-6:
            assert got[k].loo_enc != cat_mean


def test_fleiss_kappa_matches_reference(spark, sf_smoke):
    from vector_ai_npm_spark.operators.eval_metrics import label_fleiss_kappa

    items = duckdb.sql(
        f"SELECT vec_id, label FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    n_ann = 3
    cells: Counter = Counter()
    cat: Counter = Counter()
    for vec_id, label in items:
        for i in range(n_ann):
            noise = _md5_mod(f"{vec_id}#ann{i}", 10)
            v = (label + i + 1) % 10 if noise < 2 else label
            cells[(vec_id, v)] += 1
            cat[v] += 1
    n_items = len(items)
    sum_nij2 = sum(c * c for c in cells.values())
    p_bar = (sum_nij2 - n_items * n_ann) / (n_items * n_ann * (n_ann - 1))
    p_e = sum(c * c for c in cat.values()) / (n_items * n_ann) ** 2
    expected = (p_bar - p_e) / (1.0 - p_e)

    row = label_fleiss_kappa(spark, sf_smoke).collect()[0]
    assert row.n_items == n_items and row.n_raters == n_ann
    assert math.isclose(row.p_bar, p_bar, rel_tol=1e-12)
    assert math.isclose(row.p_e, p_e, rel_tol=1e-12)
    assert math.isclose(row.kappa, expected, rel_tol=1e-12)
    # 20% corruption per annotator -> strong but imperfect agreement
    assert 0.3 < row.kappa < 1.0


def test_calibration_bins_match_hashlib_fixture(spark, sf_smoke):
    from vector_ai_npm_spark.operators.eval_metrics import (
        eval_calibration_bins,
    )

    items = duckdb.sql(
        f"SELECT vec_id, label FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    bins: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0])
    for vec_id, label in items:
        pos = 1 if label < 5 else 0
        s = _md5_mod(f"{vec_id}#cal", 600) + (350 if pos else 50)
        b = s // 100
        acc = bins[b]
        acc[0] += 1
        acc[1] += pos
        acc[2] += s
    got = {r.bin: r for r in eval_calibration_bins(spark, sf_smoke).collect()}
    assert set(got) == set(bins)
    total = sum(a[0] for a in bins.values())
    assert total == len(items)
    for b, (n, npos, ssum) in bins.items():
        r = got[b]
        assert (r.n_examples, r.n_pos) == (n, npos)
        assert math.isclose(r.mean_score, (ssum / n) / 1000.0, rel_tol=1e-12)
        assert math.isclose(r.frac_pos, npos / n, rel_tol=1e-12)
        assert math.isclose(
            r.abs_gap, abs(npos / n - (ssum / n) / 1000.0), rel_tol=1e-9
        )


def test_hash_buckets_match_python_tokenizer(spark, sf_smoke):
    from vector_ai_npm_spark.operators.eval_metrics import feature_hash_bucket

    texts = duckdb.sql(f"SELECT text FROM '{SF}/documents.parquet'").fetchall()
    term_n: Counter = Counter()
    for (t,) in texts:
        term_n.update(x for x in re.split(r"[^a-z0-9]+", t.lower()) if x)
    buckets: dict[int, Counter] = defaultdict(Counter)
    for term, n in term_n.items():
        buckets[_md5_mod(f"{term}#fh", 1024)][term] = n

    got = {r.bucket: r for r in feature_hash_bucket(spark, sf_smoke).collect()}
    assert set(got) == set(buckets)
    for b, terms in buckets.items():
        r = got[b]
        assert r.n_terms == len(terms)
        assert r.n_tokens == sum(terms.values())
        # dominant term, count-desc then lexicographic tiebreak
        assert r.top_term == min(terms, key=lambda t: (-terms[t], t))
    assert all(0 <= b < 1024 for b in got)

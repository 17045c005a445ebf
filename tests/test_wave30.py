"""Wave-30: fairness AUC gap vs a driver-side Mann-Whitney."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from fractions import Fraction

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


def _grp(user_id: int) -> int:
    return int(
        hashlib.md5(f"{user_id}#grp".encode()).hexdigest()[:8], 16
    ) % 2


def _auc(pairs):  # [(score, pos)]
    pairs.sort()
    n = len(pairs)
    n_pos = sum(p for _, p in pairs)
    n_neg = n - n_pos
    # average-rank Mann-Whitney with ties, exact
    s = Fraction(0)
    i = 0
    rank = 1
    while i < n:
        j = i
        while j < n and pairs[j][0] == pairs[i][0]:
            j += 1
        avg_rank = Fraction(rank + (rank + (j - i) - 1), 2)
        s += avg_rank * sum(p for _, p in pairs[i:j])
        rank += j - i
        i = j
    u = s - Fraction(n_pos * (n_pos + 1), 2)
    return u / (n_pos * n_neg), n, n_pos


def test_fairness_gap_matches_mann_whitney_reference(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    agg = defaultdict(lambda: [0, 0, 0])  # cents, n_events, n_purch
    for r in ev.select("user_id", "event_type", "value").collect():
        a = agg[r.user_id]
        a[0] += math.floor(r.value * 100 + 0.5)
        a[1] += 1
        a[2] += 1 if r.event_type == "purchase" else 0
    groups = {0: [], 1: []}
    for u, (cents, n, npur) in agg.items():
        pos = 1 if npur * 5 > n else 0
        groups[_grp(u)].append((cents, pos))
    auc_a, n_a, pos_a = _auc(groups[0])
    auc_b, n_b, pos_b = _auc(groups[1])
    got = registry.run(
        "eval_fairness_auc_gap", spark, sf_oracle
    ).collect()[0]
    assert (got.n_a, got.pos_a, got.n_b, got.pos_b) == (
        n_a, pos_a, n_b, pos_b,
    )
    # exact rational reference vs the one-division double
    assert abs(got.auc_a - float(auc_a)) < 1e-12
    assert abs(got.auc_b - float(auc_b)) < 1e-12
    assert abs(got.auc_gap - abs(float(auc_a) - float(auc_b))) < 1e-12
    # non-vacuous: the random halves genuinely differ at this n
    # (measured: auc_a ≈ 0.586, auc_b ≈ 0.450 at sf0.01 — exactly the
    # per-group disparity the gap readout exists to surface)
    assert 0 < got.auc_a < 1 and 0 < got.auc_b < 1
    assert got.auc_gap > 0

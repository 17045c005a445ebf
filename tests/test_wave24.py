"""Wave-24 operators: regression metrics and lateness profile —
re-derived against driver-side references."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


def _hmod(key: int, salt: str, mod: int) -> int:
    return int(
        hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:8], 16
    ) % mod


def test_regression_metrics_match_integer_reference(spark, sf_oracle):
    """Cent-exact SAE/SSE/SST recomputed in Python must match; MAE,
    RMSE, R² must equal the identical IEEE expressions over them."""
    ev = load_table(spark, sf_oracle, "events")
    ys, ps = [], []
    for r in ev.where("event_type = 'purchase'").select(
        "event_id", "value"
    ).collect():
        y = math.floor(r.value * 100 + 0.5)
        ys.append(y)
        ps.append(y + _hmod(r.event_id, "#reg", 2001) - 1000)
    n = len(ys)
    sae = sum(abs(p - y) for p, y in zip(ps, ys))
    sse = sum((p - y) ** 2 for p, y in zip(ps, ys))
    sst = n * sum(y * y for y in ys) - sum(ys) ** 2
    got = registry.run(
        "eval_regression_metrics", spark, sf_oracle
    ).collect()[0]
    assert (got.n, got.sae_c, got.sse_c2) == (n, sae, sse)
    assert got.sst_c2 == float(sst)  # varchar-bridge: correctly rounded
    assert got.mae == sae / n / 100
    assert got.rmse == math.sqrt(sse / n) / 100
    assert got.r2 == float(sst - n * sse) / float(sst)
    assert 0.9 < got.r2 < 1.0  # ±10-dollar noise on real values: tight fit


def test_lateness_profile_matches_simulated_arrivals(spark, sf_oracle):
    """Replay the md5 delivery delays in Python: running max of event
    time per user in arrival order, late seconds, exact quantiles."""
    ev = load_table(spark, sf_oracle, "events")
    by_user = defaultdict(list)
    for r in ev.select("user_id", "event_id", "ts").collect():
        d = r.ts - __import__("datetime").datetime(1970, 1, 1)
        t = ((d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds)
        arrival = t + _hmod(r.event_id, "#arr", 121) * 1_000_000
        by_user[r.user_id].append((arrival, r.event_id, t))
    late = []
    n_events = 0
    for rows in by_user.values():
        rows.sort()
        peak = None
        for _, _, t in rows:
            n_events += 1
            if peak is not None and peak > t:
                late.append((peak - t) // 1_000_000)
            else:
                late.append(0)
            peak = t if peak is None else max(peak, t)
    pos = sorted(s for s in late if s > 0)
    n_inorder = sum(1 for s in late if s == 0)
    got = registry.run(
        "events_lateness_profile", spark, sf_oracle
    ).collect()[0]
    assert (got.n_events, got.n_inorder) == (n_events, n_inorder)
    assert got.inorder_frac == n_inorder / n_events
    assert got.n_late == len(pos)
    assert pos, "fixture must produce late arrivals (non-vacuous)"

    def disc(p100: int) -> int:
        for i, v in enumerate(pos, start=1):
            if i * 100 >= p100 * len(pos):
                return v
        raise AssertionError

    assert (got.p50_late_s, got.p90_late_s, got.p99_late_s) == (
        disc(50), disc(90), disc(99),
    )
    assert got.max_late_s == pos[-1]

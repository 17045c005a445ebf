"""Wave-33: Kendall tau, seasonal MASE, bootstrap CI, Zipf ratios —
each checked against an independent pure-Python reference."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


def _hash_mod(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


def test_kendall_matches_naive_pair_loop(spark, sf_oracle):
    """The histogram-pair formulation must equal the O(n²) definition
    computed row-by-row in Python."""
    emb = load_table(spark, sf_oracle, "embeddings").collect()
    xy = []
    for r in emb:
        x = _hash_mod(f"{r.vec_id}#cal", 600) + (350 if r.label < 5 else 50)
        y = _hash_mod(f"{r.vec_id}#kt2", 600) + (300 if r.label < 5 else 100)
        xy.append((x, y))
    C = D = tx = ty = tb = 0
    for i in range(len(xy)):
        for j in range(i + 1, len(xy)):
            (x1, y1), (x2, y2) = xy[i], xy[j]
            if x1 == x2 and y1 == y2:
                tb += 1
            elif x1 == x2:
                tx += 1
            elif y1 == y2:
                ty += 1
            elif (x1 < x2) == (y1 < y2):
                C += 1
            else:
                D += 1
    got = registry.run("eval_kendall_tau", spark, sf_oracle).collect()[0]
    assert (got.concordant, got.discordant) == (C, D)
    assert (got.tie_x_only, got.tie_y_only, got.tie_both) == (tx, ty, tb)
    n = len(xy)
    assert got.n == n and got.n_pairs == n * (n - 1) // 2
    assert got.tau_a == (C - D) / (n * (n - 1) // 2)


def test_mase_matches_python_series(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events").select(
        "event_type", F.col("ts").cast("date").alias("day")
    ).collect()
    daily = Counter((r.event_type, r.day) for r in ev)
    series = defaultdict(list)
    for (et, day), c in sorted(daily.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        series[et].append(c)
    got = {
        r.event_type: r
        for r in registry.run(
            "events_mase_seasonal", spark, sf_oracle
        ).collect()
    }
    for et, cs in series.items():
        sae7 = sum(abs(cs[i] - cs[i - 7]) for i in range(7, len(cs)))
        sae1 = sum(abs(cs[i] - cs[i - 1]) for i in range(1, len(cs)))
        r = got[et]
        assert r.n_days == len(cs)
        assert (r.sae_seasonal, r.n_seasonal) == (sae7, len(cs) - 7)
        assert (r.sae_naive1, r.n_naive1) == (sae1, len(cs) - 1)
        assert r.mase == (sae7 * (len(cs) - 1)) / (sae1 * (len(cs) - 7))


def test_bootstrap_ci_matches_python_replay(spark, sf_oracle):
    """Replay the deterministic multiplier bootstrap in Python: same
    hash draws → same 101 resampled means → same order statistics."""
    ev = load_table(spark, sf_oracle, "events").where(
        F.col("event_type") == "purchase"
    ).collect()
    cents = defaultdict(int)
    for r in ev:
        cents[r.user_id] += int(r.value * 100 + 0.5)
    means = []
    for rep in range(101):
        num = den = 0
        for u, c in cents.items():
            w = 2 * _hash_mod(f"{u}#{rep}#bs", 2)
            num += w * c
            den += w
        means.append((num / den, rep))
    means.sort()
    got = registry.run("ab_bootstrap_ci", spark, sf_oracle).collect()[0]
    assert got.n_users == len(cents) and got.n_reps == 101
    assert got.p05_mean_cents == means[5][0]
    assert got.p50_mean_cents == means[50][0]
    assert got.p95_mean_cents == means[95][0]
    # CI must bracket sensibly
    assert got.p05_mean_cents <= got.p50_mean_cents <= got.p95_mean_cents


def test_zipf_ratio_matches_counter(spark, sf_oracle):
    import re

    docs = load_table(spark, sf_oracle, "documents").select("text").collect()
    freqs = Counter()
    for r in docs:
        freqs.update(t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t)
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {
        r.rank_k: r
        for r in registry.run("text_zipf_ratio", spark, sf_oracle).collect()
    }
    f1 = ranked[0][1]
    for k in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512):
        if k > len(ranked):
            assert k not in got
            continue
        term, freq = ranked[k - 1]
        assert (got[k].term, got[k].freq) == (term, freq)
        assert got[k].ratio_to_top == f1 / freq
    # monotone non-decreasing ratio along ranks
    ks = sorted(got)
    ratios = [got[k].ratio_to_top for k in ks]
    assert ratios == sorted(ratios)

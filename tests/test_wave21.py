"""Wave-21 operators: TVD drift, time-decay attribution, readability,
Gwet AC1, Gini impurity, peak detection — each re-derived against an
independent driver-side reference on the oracle fixture."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from fractions import Fraction

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.experiment_ops import _SPARK_ARM


def test_tvd_matches_fraction_reference(spark, sf_oracle):
    """TVD re-derived with Fractions from the raw arm/bin frame must
    equal the exact num/den pair, and sit in [0, 1]."""
    ev = load_table(spark, sf_oracle, "events")
    rows = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.floor("value").cast("bigint").alias("bin"),
            F.expr(_SPARK_ARM).alias("arm"),
        )
        .collect()
    )
    a = Counter(r.bin for r in rows if r.arm == "control")
    b = Counter(r.bin for r in rows if r.arm == "treatment")
    n_a, n_b = sum(a.values()), sum(b.values())
    bins = set(a) | set(b)
    tvd = Fraction(
        sum(abs(a[x] * n_b - b[x] * n_a) for x in bins), 2 * n_a * n_b
    )
    got = registry.run("drift_tvd_bins", spark, sf_oracle).collect()[0]
    assert (got.n_a, got.n_b, got.n_bins) == (n_a, n_b, len(bins))
    assert Fraction(got.tvd_num, got.tvd_den) == tvd
    assert 0 <= got.tvd <= 1


def test_time_decay_matches_ledger_reference(spark, sf_oracle):
    """Micro-ledger credits recomputed touch-by-touch in Python must
    match exactly; channel totals reconcile to total purchase revenue
    within 0.5 micro-units per touch (the documented ledger bound)."""
    ev = load_table(spark, sf_oracle, "events")
    evs = ev.select("event_id", "user_id", "ts", "event_type", "value")
    rows = evs.collect()
    touches = defaultdict(list)
    for r in rows:
        if r.event_type in ("click", "view"):
            touches[r.user_id].append((r.ts, r.event_type))
    ledger: Counter = Counter()
    n_touch: Counter = Counter()
    direct_micro = 0
    n_direct = 0
    total_value = 0.0
    for r in rows:
        if r.event_type != "purchase":
            continue
        total_value += r.value
        # weight 2^(6 - whole-day age); age via exact microsecond diff
        pairs = []
        for ts, ch in touches[r.user_id]:
            if not (ts < r.ts):
                continue
            delta = r.ts - ts
            d_us = (
                (delta.days * 86_400 + delta.seconds) * 1_000_000
                + delta.microseconds
            )
            if d_us > 7 * 86_400_000_000:
                continue
            d = d_us // 86_400_000_000
            pairs.append((ch, 2 ** (6 - d)))
        if not pairs:
            direct_micro += math.floor(r.value * 1_000_000 + 0.5)
            n_direct += 1
            continue
        sw = sum(w for _, w in pairs)
        for ch, w in pairs:
            n_touch[ch] += 1
            ledger[ch] += math.floor(r.value * (w * 1_000_000) / sw + 0.5)
    got = {
        r.channel: r
        for r in registry.run(
            "attribution_time_decay", spark, sf_oracle
        ).collect()
    }
    for ch in ("click", "view"):
        assert got[ch].credit_micro == ledger[ch], ch
        assert got[ch].n_touches == n_touch[ch], ch
    if n_direct:
        assert got["direct"].credit_micro == direct_micro
    credited = sum(r.credit_micro for r in got.values())
    touches_total = sum(r.n_touches for r in got.values())
    assert abs(credited - total_value * 1_000_000) <= 0.5 * touches_total + 1


def test_readability_matches_regex_reference(spark, sf_oracle):
    """Per-source Flesch re-derived with Python regexes over the raw
    text must reproduce the integer counts and the score formula."""
    docs = load_table(spark, sf_oracle, "documents").select("source", "text")
    sums = defaultdict(lambda: [0, 0, 0, 0])  # n, w, y, s
    for r in docs.collect():
        lower = r.text.lower()
        w = len(re.findall(r"[a-z]+", lower))
        y = len(re.findall(r"[aeiouy]+", lower))
        s = max(len(re.findall(r"[.!?]+", r.text)), 1)
        acc = sums[r.source]
        acc[0] += 1
        acc[1] += w
        acc[2] += y
        acc[3] += s
    got = {
        r.source: r
        for r in registry.run("text_readability", spark, sf_oracle).collect()
    }
    expected_sources = {s for s, acc in sums.items() if acc[1] > 0}
    assert set(got) == expected_sources
    for src, (n, w, y, s) in sums.items():
        if w == 0:
            continue
        r = got[src]
        assert (r.n_docs, r.words, r.syllables, r.sentences) == (n, w, y, s)
        flesch = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        assert r.flesch == flesch
        band = (
            "easy" if flesch >= 70
            else "standard" if flesch >= 50
            else "difficult" if flesch >= 30
            else "very_difficult"
        )
        assert r.band == band


def test_gwet_ac1_matches_fraction_reference(spark, sf_oracle):
    """AC1 re-derived from the shared vote fixture with Fractions: the
    textbook pa/pe route must equal the shipped int64 reduction."""
    from vector_ai_npm_spark.operators.curation_dq import _N_ANN, vote_expr

    emb = load_table(spark, sf_oracle, "embeddings")
    votes = defaultdict(Counter)
    for i in range(_N_ANN):
        for r in emb.select("vec_id", vote_expr(i).alias("v")).collect():
            votes[r.vec_id][r.v] += 1
    n = len(votes)
    q = 10
    r_ = _N_ANN
    pa = Fraction(
        sum(c * (c - 1) for item in votes.values() for c in item.values()),
        n * r_ * (r_ - 1),
    )
    tq = Counter()
    for item in votes.values():
        tq.update(item)
    pe = Fraction(
        sum(t * (r_ * n - t) for t in tq.values()), (q - 1) * (r_ * n) ** 2
    )
    ac1 = (pa - pe) / (1 - pe)
    got = registry.run("eval_gwet_ac1", spark, sf_oracle).collect()[0]
    assert got.n == n
    assert Fraction(got.ac1_num, got.ac1_den) == ac1
    # ~80% per-rater accuracy fixture: agreement must be clearly real
    assert 0.3 < got.ac1 < 1.0


def test_gini_impurity_matches_fraction_reference(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    cells = defaultdict(Counter)
    for r in docs.select("source", "lang").collect():
        cells[r.source][r.lang] += 1
    got = {
        r.source: r
        for r in registry.run(
            "feature_gini_impurity", spark, sf_oracle
        ).collect()
    }
    assert set(got) == set(cells)
    for src, langs in cells.items():
        n = sum(langs.values())
        imp = Fraction(n * n - sum(c * c for c in langs.values()), n * n)
        r = got[src]
        assert (r.n, r.n_langs) == (n, len(langs))
        assert Fraction(r.imp_num, r.imp_den) == imp
        assert 0 <= r.gini_impurity < 1


def test_peak_detect_matches_series_reference(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    daily = Counter()
    for r in ev.select(
        "event_type", F.col("ts").cast("date").alias("day")
    ).collect():
        daily[(r.event_type, r.day)] += 1
    series = defaultdict(dict)
    for (et, day), x in daily.items():
        series[et][day] = x
    expected = set()
    for et, by_day in series.items():
        days = sorted(by_day)
        for i in range(1, len(days) - 1):
            x, p, nx = (
                by_day[days[i]], by_day[days[i - 1]], by_day[days[i + 1]],
            )
            if x > p and x > nx:
                expected.add((et, days[i], x, p, nx))
    got = {
        (r.event_type, r.day, r.x, r.prev_x, r.next_x)
        for r in registry.run(
            "events_peak_detect", spark, sf_oracle
        ).collect()
    }
    assert got == expected
    assert expected  # fixture has peaks — the query is not vacuous

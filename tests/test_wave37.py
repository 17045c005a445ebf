"""Wave-37: schema drift, RBO, TIFF dims — independent references."""

from __future__ import annotations

import hashlib
import math
import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.multimodal.tiff import (
    encode_tiff_header,
    is_tiff,
    tiff_dims,
)


def _hash_mod(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


def test_schema_drift_matches_python(spark, sf_oracle):
    import json as _json
    from collections import defaultdict

    ev = load_table(spark, sf_oracle, "events").collect()
    agg = defaultdict(lambda: {"n": 0, "fails": 0, "types": set(),
                               "users": set(), "cents": []})
    for r in ev:
        ep = _hash_mod(f"{r.event_id}#ep", 2)
        a = agg[ep]
        a["n"] += 1
        try:
            int(_json.loads(r.props)["k"])
        except Exception:
            a["fails"] += 1
        a["types"].add(r.event_type)
        a["users"].add(r.user_id)
        a["cents"].append(int(r.value * 100 + 0.5))
    got = {
        r.epoch: r
        for r in registry.run("dq_schema_drift", spark, sf_oracle).collect()
    }
    assert set(got) == set(agg)
    for ep, a in agg.items():
        g = got[ep]
        assert g.n_rows == a["n"]
        assert g.k_parse_fails == a["fails"]
        assert g.n_event_types == len(a["types"])
        assert g.n_users == len(a["users"])
        assert (g.min_cents, g.max_cents) == (min(a["cents"]), max(a["cents"]))


def test_rbo_matches_python_replay(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    q = vecs[7]

    def cos(a, b):
        return float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))

    rank_a = [v for _, v in sorted((-cos(x, q), vid) for vid, x in vecs.items())]
    rank_b = [
        v for _, v in sorted(
            (-cos(x[:16], q[:16]), vid) for vid, x in vecs.items()
        )
    ]
    got = registry.run("eval_rank_rbo", spark, sf_oracle).collect()[0]
    pows = [1.0]
    for _ in range(9):
        pows.append(pows[-1] * 0.9)
    rbo = 0.0
    for d in range(1, 11):
        ov = len(set(rank_a[:d]) & set(rank_b[:d]))
        if d == 1:
            assert got.ov1 == ov
        if d == 5:
            assert got.ov5 == ov
        if d == 10:
            assert got.ov10 == ov
        rbo += pows[d - 1] * ov / d
    rbo *= 0.1
    assert abs(got.rbo - rbo) < 1e-12
    assert 0.0 <= got.rbo <= 1.0
    # identical rankings would give RBO exactly (1-p)·Σ p^(d-1) — the
    # truncated maximum; prefix ranking must not exceed it
    max_rbo = 0.1 * sum(pows[d - 1] for d in range(1, 11))
    assert got.rbo <= max_rbo + 1e-12


def test_tiff_roundtrip_and_malformed():
    for little in (True, False):
        for w, h in ((1, 1), (300, 200), (4000, 3000), (70000, 65535)):
            p = encode_tiff_header(w, h, little=little)
            assert is_tiff(p)
            assert tiff_dims(p) == (
                w, h, "little" if little else "big",
            )
    with pytest.raises(ValueError, match="not a TIFF"):
        tiff_dims(b"JJ*\x00" + b"\x00" * 20)
    p = encode_tiff_header(10, 10)
    with pytest.raises(ValueError, match="truncated"):
        tiff_dims(p[:20])
    # IFD offset past EOF
    bad = p[:4] + struct.pack("<I", 10_000) + p[8:]
    with pytest.raises(ValueError, match="past end"):
        tiff_dims(bad)
    # missing dims tags: header with zero entries
    empty = p[:8] + struct.pack("<H", 0) + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="missing"):
        tiff_dims(empty)
    with pytest.raises(ValueError, match="range"):
        encode_tiff_header(1, 100_000)  # height exceeds SHORT

def test_ses_matches_python_recurrence(spark, sf_oracle):
    """Wave-39 rider: the SES fold must equal the sequential Python
    recurrence bit-for-bit (identical fold order, α=1/2)."""
    from collections import Counter, defaultdict

    ev = load_table(spark, sf_oracle, "events").select(
        "event_type", F.col("ts").cast("date").alias("day")
    ).collect()
    daily = Counter((r.event_type, r.day) for r in ev)
    series = defaultdict(list)
    for (et, day), c in sorted(daily.items(), key=lambda kv: kv[0]):
        series[et].append((str(day), c))
    got = {
        (r.event_type, r.day): r
        for r in registry.run(
            "events_forecast_ses", spark, sf_oracle
        ).collect()
    }
    for et, rows in series.items():
        s = None
        for day, c in rows:
            prev = s
            s = float(c) if s is None else 0.5 * c + 0.5 * s
            g = got[(et, day)]
            assert g.ses_level == s, (et, day)
            if prev is None:
                assert g.forecast is None and g.abs_err is None
            else:
                assert g.forecast == prev
                assert g.abs_err == abs(c - prev)


def test_ngram_novelty_matches_python(spark, sf_oracle):
    """Wave-40 rider: novelty rate equals the Python set computation."""
    import hashlib
    import re

    docs = load_table(spark, sf_oracle, "documents").select(
        "doc_id", "text"
    ).collect()

    def grams(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        if len(toks) >= 8:
            return {" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)}
        return {" ".join(toks)}

    a, b = set(), set()
    na = nb = 0
    for r in docs:
        ep = int(
            hashlib.md5(f"{r.doc_id}#crawl".encode()).hexdigest()[:8], 16
        ) % 2
        if ep == 0:
            a |= grams(r.text)
            na += 1
        else:
            b |= grams(r.text)
            nb += 1
    got = registry.run("text_ngram_novelty", spark, sf_oracle).collect()[0]
    assert (got.n_docs_a, got.n_docs_b) == (na, nb)
    assert (got.n_grams_a, got.n_grams_b) == (len(a), len(b))
    assert got.n_new_in_b == len(b - a)
    assert got.novelty_rate == len(b - a) / len(b)


def test_power_analysis_matches_python(spark, sf_oracle):
    """Wave-40 rider: n_per_arm equals the textbook formula on exact
    per-user cents."""
    from collections import defaultdict

    ev = load_table(spark, sf_oracle, "events").where(
        F.col("event_type") == "purchase"
    ).collect()
    cents = defaultdict(int)
    for r in ev:
        cents[r.user_id] += int(r.value * 100 + 0.5)
    vals = list(cents.values())
    n = len(vals)
    s, s2 = sum(vals), sum(v * v for v in vals)
    mean = s / n
    var = (n * s2 - s * s) / (n * (n - 1))
    z = 1.959963984540054 + 0.8416212335729143
    mde = 0.05 * mean
    got = registry.run(
        "events_power_analysis", spark, sf_oracle
    ).collect()[0]
    assert got.n_users == n
    assert abs(got.mean_cents - mean) < 1e-9
    assert abs(got.var_cents2 - var) < max(1e-6, var * 1e-12)
    assert got.n_per_arm == math.ceil(2.0 * (z * z) * var / (mde * mde))
    assert got.n_per_arm > 0

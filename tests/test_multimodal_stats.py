"""Wave-15 corpus-level multimodal stats: hashlib-reconstructed
brute-force cross-checks (the test_eval_metrics.py discipline)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb

from conftest import SF_SMOKE as SF  # single source for the fixture path


def _chain(text: str) -> str:
    return (
        hashlib.sha256(text.encode()).hexdigest()
        + hashlib.sha256((text + "a").encode()).hexdigest()
        + hashlib.sha256((text + "b").encode()).hexdigest()
    )


def test_channel_stats_match_hashlib_pixels(spark, sf_smoke):
    from vector_ai_npm_spark.multimodal.stats import multimodal_channel_stats

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    sums = {c: [0, 0, 0] for c in range(3)}  # n, sx, sxx
    for doc_id, text in rows:
        w, h = 4 + doc_id % 5, 4 + doc_id % 3
        body = _chain(text)[: w * h * 3].encode()
        for i, v in enumerate(body):
            acc = sums[i % 3]
            acc[0] += 1
            acc[1] += v
            acc[2] += v * v
    got = {r.channel: r for r in
           multimodal_channel_stats(spark, sf_smoke).collect()}
    assert set(got) == {0, 1, 2}
    for c, (n, sx, sxx) in sums.items():
        r = got[c]
        assert r.n_px == n
        assert math.isclose(r.mean_px, sx / n, rel_tol=1e-12)
        assert math.isclose(
            r.std_px, math.sqrt(sxx / n - (sx / n) ** 2), rel_tol=1e-12
        )
        # hex-digit ASCII bytes live in [48, 102]
        assert 48 <= r.mean_px <= 102 and r.std_px > 0


def test_vad_segments_match_hashlib_islands(spark, sf_smoke):
    from vector_ai_npm_spark.multimodal.stats import multimodal_audio_vad

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    expected = defaultdict(list)  # asset -> [(start, end, n, esum)]
    for doc_id, text in rows:
        wave = _chain(text)[:96].encode()
        seg = None
        for i in range(6):
            fr = wave[i * 16 : (i + 1) * 16]
            e = sum(v * v for v in fr)
            if e > 90_000:
                if seg and seg[1] == i - 1:
                    seg = (seg[0], i, seg[2] + 1, seg[3] + e)
                else:
                    if seg:
                        expected[doc_id].append(seg)
                    seg = (i, i, 1, e)
        if seg:
            expected[doc_id].append(seg)

    got = defaultdict(list)
    for r in multimodal_audio_vad(spark, sf_smoke).collect():
        got[r.asset_id].append(
            (r.start_frame, r.end_frame, r.n_frames, r.energy_sum)
        )
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in expected.items()
    }
    # segments are contiguous voiced runs: span == frame count
    for segs in got.values():
        for s, e, n, _ in segs:
            assert e - s + 1 == n

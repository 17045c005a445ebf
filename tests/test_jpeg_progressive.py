"""Progressive JPEG (SOF2) codec properties (wave 47).

The sharpest invariant available: the progressive and baseline
encoders quantize identically, so decoding a progressive stream must
be BIT-IDENTICAL to decoding the baseline stream of the same pixels —
any defect in scan assembly (EOB-run folding, ZRL skips, refinement
correction-bit order, DC successive approximation) breaks equality.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_ai_npm_spark.multimodal.binary import decode_pixels
from vector_ai_npm_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
from vector_ai_npm_spark.multimodal.jpeg_progressive import (
    decode_jpeg_progressive,
    encode_jpeg_progressive,
)


def _check(w, h, px, color, q):
    pj = encode_jpeg_progressive(w, h, px, color=color, quality=q)
    base = decode_jpeg(encode_jpeg(w, h, px, color=color, quality=q))
    assert decode_jpeg_progressive(pj) == base
    # and the shared dispatch routes SOF2 here
    assert decode_pixels(pj) == base


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=32),
    st.integers(min_value=1, max_value=32),
    st.booleans(),
    st.sampled_from([35, 75, 92, 100]),
    st.randoms(use_true_random=False),
)
def test_progressive_matches_baseline_random(w, h, color, q, rnd):
    n = w * h * (3 if color else 1)
    px = bytes(rnd.randrange(256) for _ in range(n))
    _check(w, h, px, color, q)


def test_progressive_constant_image_max_eob_runs():
    # every AC band zero -> EOBRUN spans all blocks of each scan
    _check(256, 96, bytes([77] * (256 * 96 * 3)), True, 90)
    _check(256, 96, bytes([201] * (256 * 96)), False, 35)


def test_progressive_sparse_image_zrl_chains():
    a = np.zeros((80, 160, 3), np.uint8)
    a[::16, ::16] = 255
    _check(160, 80, a.tobytes(), True, 50)


def test_progressive_gradient_refinement_heavy():
    yy, xx = np.mgrid[0:120, 0:120]
    g = ((xx * 2 + yy) % 256).astype(np.uint8)
    _check(120, 120, np.stack([g, g.T, 255 - g], -1).tobytes(), True, 92)
    _check(120, 120, g.tobytes(), False, 92)


def test_progressive_checkerboard_high_frequency():
    yy, xx = np.mgrid[0:64, 0:64]
    cb = (((xx // 2 + yy // 2) % 2) * 255).astype(np.uint8)
    _check(64, 64, cb.tobytes(), False, 75)


def test_progressive_dri_roundtrip():
    """r12: progressive + restart intervals decode (the r11 baseline-DRI
    machinery extended to every SOF2 scan type — DC first/refine, AC
    first/refine).  The stream must really carry RST markers, and the
    decoded bytes still match the baseline decode bit-for-bit."""
    yy, xx = np.mgrid[0:48, 0:80]
    g = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    for w, h, px, color, ri in [
        (80, 48, np.stack([g, 255 - g, g // 2], -1).tobytes(), True, 3),
        (80, 48, g.tobytes(), False, 1),
        (64, 64, bytes([90] * (64 * 64)), False, 5),  # EOB runs + DRI
    ]:
        pj = encode_jpeg_progressive(
            w, h, px, color=color, quality=80, restart_interval=ri
        )
        assert any(
            bytes((0xFF, 0xD0 + n)) in pj for n in range(8)
        ), "fixture must actually exercise RST markers"
        base = decode_jpeg(encode_jpeg(w, h, px, color=color, quality=80))
        assert decode_jpeg_progressive(pj) == base
        assert decode_pixels(pj) == base


def test_progressive_dri_out_of_sequence_raises():
    pj = bytearray(
        encode_jpeg_progressive(
            80, 48, bytes(80 * 48), color=False, quality=80,
            restart_interval=1,
        )
    )
    i = bytes(pj).find(b"\xff\xd0")
    assert i > 0
    pj[i + 1] = 0xD5  # forge RST5 where RST0 belongs
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg_progressive(bytes(pj))


def test_unsupported_rungs_still_quarantine():
    # subsampled chroma remains the documented seam (DRI no longer is)
    pj = bytearray(encode_jpeg_progressive(16, 16, bytes(16 * 16 * 3)))
    i = bytes(pj).find(b"\xff\xc2")
    assert i > 0
    # SOF2 layout: FF C2 len(2) prec(1) h(2) w(2) nc(1) [cid samp tq]*
    pj[i + 11] = 0x22  # comp 1 sampling 2x2
    with pytest.raises(NotImplementedError, match="subsampled"):
        decode_jpeg_progressive(bytes(pj))

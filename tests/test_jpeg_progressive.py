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


def test_unsupported_rungs_still_quarantine():
    pj = bytearray(encode_jpeg_progressive(8, 8, bytes(64), color=False))
    # forge a DRI segment after APP0 (ends at offset 20)
    dri = b"\xff\xdd" + b"\x00\x04" + b"\x00\x08"
    forged = bytes(pj[:20]) + dri + bytes(pj[20:])
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg_progressive(forged)

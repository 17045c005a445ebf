"""TIFF pixel codec properties (wave 46): PackBits + TIFF-LZW
roundtrips across width boundaries, strips, both endians, the
horizontal predictor, and the quarantine raises."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_ai_npm_spark.multimodal.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
    tiff_dims,
    tiff_lzw_decode,
    tiff_lzw_encode,
)


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=3000))
def test_packbits_roundtrip(data):
    assert packbits_decode(packbits_encode(data), len(data)) == data


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_lzw_roundtrip(data):
    assert tiff_lzw_decode(tiff_lzw_encode(data), len(data)) == data


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=400, max_value=6000),
)
def test_lzw_roundtrip_low_entropy_crosses_width_bumps(alpha, n):
    """Small alphabets force long table growth — the stream crosses
    the 9→10→11→12-bit early-change boundaries and the 4094 clear."""
    data = bytes((i * 31) % alpha for i in range(n))
    assert tiff_lzw_decode(tiff_lzw_encode(data), n) == data


def test_lzw_kwkwk_and_runs():
    for n in (1, 2, 510, 511, 512, 1022, 4093, 4094, 4095, 70000):
        data = b"\x07" * n
        assert tiff_lzw_decode(tiff_lzw_encode(data), n) == data


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.sampled_from([1, 5, 32773]),
    st.booleans(),
    st.sampled_from([1, 2, 5, None]),
    st.randoms(use_true_random=False),
)
def test_tiff_container_roundtrip(w, h, comp, little, rps, rnd):
    px = bytes(rnd.randrange(256) for _ in range(w * h))
    pred = 2 if (comp == 5 and rnd.random() < 0.5) else 1
    t = encode_tiff(
        w, h, px, compression=comp, little=little,
        rows_per_strip=rps, predictor=pred,
    )
    assert decode_tiff(t) == (w, h, px)
    assert tiff_dims(t)[:2] == (w, h)


def test_old_style_jpeg_in_tiff_quarantines():
    """Compression=6 (deprecated old-style JPEG) stays a reasoned
    quarantine; new-style 7 decodes (tests below)."""
    t = bytearray(encode_tiff(4, 4, bytes(16)))
    n = struct.unpack("<H", t[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack("<H", t[off : off + 2])[0] == 259:
            t[off + 8 : off + 10] = struct.pack("<H", 6)
    with pytest.raises(ValueError, match="quarantine"):
        decode_tiff(bytes(t))


def _noise(w, h):
    return bytes(((x * 7 + y * 13 + (x * y) // 5) % 256)
                 for y in range(h) for x in range(w))


@pytest.mark.parametrize("shared", [True, False])
@pytest.mark.parametrize("rps", [None, 5])
def test_jpeg_in_tiff_roundtrip(shared, rps):
    from vector_ai_npm_spark.multimodal.tiff import encode_tiff_jpeg

    w, h = 17, 23
    px = _noise(w, h)
    t = encode_tiff_jpeg(w, h, px, rows_per_strip=rps,
                         use_jpeg_tables=shared)
    dw, dh, dec = decode_tiff(t)
    assert (dw, dh) == (w, h)
    assert len(dec) == w * h
    mae = sum(abs(a - b) for a, b in zip(dec, px)) / (w * h)
    assert mae <= 8.0          # lossy, bounded
    assert dec != px           # and genuinely lossy


def test_jpeg_in_tiff_layouts_decode_identically():
    """Tag-347 shared tables + abbreviated strips must decode byte-
    identical to the self-contained layout — splitting is plumbing."""
    from vector_ai_npm_spark.multimodal.tiff import encode_tiff_jpeg

    w, h = 16, 14
    px = _noise(w, h)
    a = decode_tiff(encode_tiff_jpeg(w, h, px, rows_per_strip=4,
                                     use_jpeg_tables=True))
    b = decode_tiff(encode_tiff_jpeg(w, h, px, rows_per_strip=4,
                                     use_jpeg_tables=False))
    assert a == b


def test_jpeg_in_tiff_corrupt_strip_raises():
    from vector_ai_npm_spark.multimodal.tiff import encode_tiff_jpeg

    w, h = 12, 12
    t = bytearray(encode_tiff_jpeg(w, h, _noise(w, h)))
    # zero out the strip's SOI (strip data sits at the tail)
    i = bytes(t).rfind(b"\xff\xd8")
    t[i : i + 2] = b"\x00\x00"
    with pytest.raises(ValueError):
        decode_tiff(bytes(t))


def test_multisample_and_deep_depth_quarantine():
    t = bytearray(encode_tiff(3, 3, bytes(9)))
    n = struct.unpack("<H", t[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack("<H", t[off : off + 2])[0] == 258:
            t[off + 8 : off + 10] = struct.pack("<H", 16)
    with pytest.raises(ValueError, match="8-bit"):
        decode_tiff(bytes(t))


def test_truncated_strip_raises():
    t = encode_tiff(8, 8, bytes(range(64)), compression=32773)
    with pytest.raises(ValueError):
        decode_tiff(t[:-3])

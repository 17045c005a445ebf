"""Wave 49: VP8L (WebP lossless) pure-Python codec.

Property tests walk every decoder stage over spec-shaped bitstreams
produced by the independent encoder half (the gif.py/jpeg.py fixture
pattern): prefix-code headers (simple 1/2-symbol, normal with the
16/17/18 repeat protocol and the max_symbol shortcut, degenerate
single-symbol trees), LZ77 with 2D-mapped and absolute distances
(overlap copies included), the 0x1E35A7BD color cache, meta prefix
groups, and all four transforms (predictor incl. Select/clamped
add-subtract, cross-color, subtract-green, color-indexing with
1/2/4-bit pixel bundling).  Malformed streams must raise ValueError
(the quarantine contract), never return wrong pixels silently.

A libwebp cross-check runs whenever PIL+libwebp is importable; in
this environment it skips — the distance-map honesty note in
vp8l.py's docstring documents the residual risk.
"""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_ai_npm_spark.multimodal.binary import decode_pixels
from vector_ai_npm_spark.multimodal.vp8l import (
    _DISTANCE_MAP,
    _BitWriter,
    _encode_image_stream,
    decode_vp8l_chunk,
    encode_vp8l,
)
from vector_ai_npm_spark.multimodal.webp import (
    encode_webp_lossless,
    has_native_webp,
    webp_dims,
)

_CONFIGS = (
    dict(),
    dict(use_lz77=False),
    dict(cache_bits=4),
    dict(cache_bits=1),
    dict(subtract_green=True),
    dict(subtract_green=True, cache_bits=6),
    dict(predictor_bits=2),
    dict(predictor_bits=4, subtract_green=True),
    dict(color_transform_bits=2),
    dict(color_transform_bits=3, subtract_green=True, cache_bits=2),
    dict(meta_bits=2),
    dict(meta_bits=2, cache_bits=4, use_max_symbol=True),
    dict(use_max_symbol=True),
)


def _gradient(w: int, h: int) -> bytes:
    return bytes(
        ((x * 7 + y * 13 + c * 29) & 0xFF)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 19),
    h=st.integers(1, 14),
    cfg=st.integers(0, len(_CONFIGS) - 1),
    style=st.integers(0, 3),
    seed=st.integers(0, 2**32 - 1),
)
def test_roundtrip_property(w, h, cfg, style, seed):
    rng = random.Random(seed)
    if style == 0:
        rgb = bytes(rng.randrange(256) for _ in range(3 * w * h))
    elif style == 1:  # few colors → heavy LZ77 + cache hits
        cols = [
            bytes(rng.randrange(256) for _ in range(3))
            for _ in range(rng.randint(1, 4))
        ]
        rgb = b"".join(rng.choice(cols) for _ in range(w * h))
    elif style == 2:  # solid → dist-1 overlap copies, 1-symbol trees
        rgb = bytes(rng.randrange(256) for _ in range(3)) * (w * h)
    else:  # gradient → predictor-friendly
        rgb = _gradient(w, h)
    chunk = encode_vp8l(w, h, rgb, **_CONFIGS[cfg])
    assert decode_vp8l_chunk(chunk) == (w, h, rgb)


@pytest.mark.parametrize("n_colors, wb", [(2, 3), (4, 2), (16, 1), (64, 0)])
def test_palette_bundling_widths(n_colors, wb):
    """Every color-indexing bundling width, including the 8-per-byte
    1-bit packing the oracle corpus doesn't reach (n=2)."""
    rng = random.Random(n_colors)
    w, h = 13, 6  # 13 not divisible by any pack → partial last byte
    cols = [bytes((i * 37 % 256, i * 59 % 256, i * 83 % 256)) for i in range(n_colors)]
    rgb = b"".join(cols[rng.randrange(n_colors)] for _ in range(w * h))
    chunk = encode_vp8l(w, h, rgb, palette=True)
    assert decode_vp8l_chunk(chunk) == (w, h, rgb)


def test_distance_map_head_and_uniqueness():
    """The generated 2D map must match the published head of the
    spec's table and contain 120 unique in-window offsets."""
    assert _DISTANCE_MAP[:12] == (
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    )
    assert _DISTANCE_MAP[22:40] == (
        (0, 4), (4, 0), (1, 4), (-1, 4), (4, 1), (-4, 1),
        (3, 3), (-3, 3), (2, 4), (-2, 4), (4, 2), (-4, 2),
        (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    )
    assert len(set(_DISTANCE_MAP)) == 120
    for dx, dy in _DISTANCE_MAP:
        assert 0 <= dy <= 7 and -7 <= dx <= 8 and (dy > 0 or dx > 0)
    # tail (codes 97-120): the dx range is asymmetric (-7..8) — a
    # symmetric -8..8 window reproduces the head but diverges here
    # (r10 advice: code 103 must be (8,2), not (-8,1)), so the tail is
    # pinned verbatim against the published spec table
    assert _DISTANCE_MAP[96:] == (
        (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1),
        (8, 2), (6, 6), (-6, 6), (8, 3), (5, 7), (-5, 7),
        (7, 5), (-7, 5), (8, 4), (6, 7), (-6, 7), (7, 6),
        (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
    )


def test_truncated_stream_raises():
    rgb = _gradient(9, 7)
    chunk = encode_vp8l(9, 7, rgb, cache_bits=3)
    for cut in (1, 4, len(chunk) // 2, len(chunk) - 1):
        with pytest.raises(ValueError):
            decode_vp8l_chunk(chunk[:cut])


def test_bad_signature_and_version_raise():
    with pytest.raises(ValueError):
        decode_vp8l_chunk(b"\x2e\x00\x00\x00\x00")
    chunk = bytearray(encode_vp8l(2, 2, bytes(12)))
    chunk[4] |= 0xE0  # version bits live at the top of byte 4
    with pytest.raises(ValueError):
        decode_vp8l_chunk(bytes(chunk))


def test_out_of_range_palette_index_raises():
    """Hand-built stream: 3-entry palette but a packed index of 3 —
    the decoder must RAISE (the PNG palette precedent), not emit
    arbitrary pixels."""
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(0, 14)  # width 1
    bw.write(0, 14)  # height 1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # a transform follows
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(2, 8)  # 3 colors
    palette = [0xFF101010, 0x00202020, 0x00303030]  # delta-coded already
    _encode_image_stream(bw, palette, 3, 1, False)
    bw.write(0, 1)  # end of transforms
    # packed image: one pixel, green nibble index = 3 (out of range)
    _encode_image_stream(bw, [0xFF000000 | (3 << 8)], 1, 1, True)
    with pytest.raises(ValueError, match="palette index"):
        decode_vp8l_chunk(bw.done())


def test_single_pixel_and_single_row_and_column():
    for w, h in ((1, 1), (1, 9), (9, 1)):
        rgb = _gradient(w, h)
        for cfg in (dict(), dict(predictor_bits=2), dict(cache_bits=2)):
            chunk = encode_vp8l(w, h, rgb, **cfg)
            assert decode_vp8l_chunk(chunk) == (w, h, rgb)


def test_container_roundtrip_and_dims():
    rgb = _gradient(11, 5)
    payload = encode_webp_lossless(11, 5, rgb, subtract_green=True)
    assert webp_dims(payload) == (11, 5, "vp8l")
    assert decode_pixels(payload) == (11, 5, rgb)


def test_vp8x_wrapped_vp8l_decodes():
    """Extended (VP8X) containers holding a VP8L image chunk route to
    the pure-Python decode — dims report the VP8X canvas, pixels come
    from the inner lossless stream."""
    rgb = _gradient(6, 4)
    inner = encode_webp_lossless(6, 4, rgb)
    vp8l_chunk = inner[12:]  # the VP8L chunk incl. header
    vp8x = (
        b"VP8X" + struct.pack("<I", 10)
        + b"\x00\x00\x00\x00" + (5).to_bytes(3, "little")
        + (3).to_bytes(3, "little")
    )
    body = vp8x + vp8l_chunk
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    assert webp_dims(payload)[2] == "vp8x"
    assert decode_pixels(payload) == (6, 4, rgb)


def test_lossy_vp8_still_reasoned_rejection():
    from vector_ai_npm_spark.multimodal.webp import (
        decode_webp_auto,
        encode_webp_header,
    )

    payload = encode_webp_header(16, 16, "vp8")
    if has_native_webp():
        pytest.skip("libwebp present: lossy decode is live")
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp_auto(payload)


@pytest.mark.skipif(not has_native_webp(), reason="PIL/libwebp absent")
def test_cross_check_against_libwebp():
    """When a real codec is importable, our encoder's output must
    decode identically under libwebp AND our decoder must agree with
    libwebp on a PIL-encoded lossless file (distance-map honesty)."""
    import io

    from PIL import Image

    rgb = _gradient(33, 21)
    ours = encode_webp_lossless(33, 21, rgb, cache_bits=4, predictor_bits=2)
    img = Image.open(io.BytesIO(ours)).convert("RGB")
    assert (img.width, img.height, img.tobytes()) == (33, 21, rgb)

    src = Image.frombytes("RGB", (33, 21), rgb)
    buf = io.BytesIO()
    src.save(buf, format="WEBP", lossless=True)
    w, h, dec = decode_pixels(buf.getvalue())
    assert (w, h, dec) == (33, 21, rgb)

"""Wave 36: pure-Python GIF codec — LZW edges, container handling."""

from __future__ import annotations

import random
import struct

import pytest

from vector_ai_npm_spark.multimodal.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def test_lzw_roundtrip_grid():
    """All min-code-sizes × stream lengths, incl. width growth to 12
    bits and the 4096-entry clear-code reset (20k mixed pixels)."""
    rng = random.Random(7)
    for mcs in (2, 3, 5, 7, 8):
        for n in (0, 1, 5, 100, 3000, 20000):
            idx = bytes(rng.randrange(1 << mcs) for _ in range(n))
            assert lzw_decode(lzw_encode(idx, mcs), mcs, n) == idx


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=2, max_value=8),
    st.lists(st.integers(min_value=0, max_value=255), max_size=600),
)
def test_lzw_roundtrip_property(mcs: int, vals: list[int]) -> None:
    """lzw_decode ∘ lzw_encode == id for any index stream — Hypothesis
    shrinks width-sync bugs (like the round-9 EOI-width off-by-one) to
    minimal counterexamples."""
    idx = bytes(v % (1 << mcs) for v in vals)
    assert lzw_decode(lzw_encode(idx, mcs), mcs, len(idx)) == idx


def test_lzw_kwkwk_case():
    """Repetitive streams exercise code == next_code (the entry being
    defined by the very code that references it)."""
    for pat in (b"\x01\x00" * 500, b"\x00" * 1000, b"\x01\x01\x00" * 400):
        assert lzw_decode(lzw_encode(pat, 2), 2, len(pat)) == pat


def test_lzw_malformed_raises():
    with pytest.raises(ValueError, match="truncated"):
        lzw_decode(b"", 2, 10)
    # a code far beyond next_code is invalid
    good = lzw_encode(b"\x00\x01\x02\x03" * 10, 2)
    with pytest.raises(ValueError):
        lzw_decode(bytes([0xFF] * len(good)), 2, 40)
    # stream producing more pixels than the image area
    idx = b"\x00" * 100
    with pytest.raises(ValueError, match="more pixels"):
        lzw_decode(lzw_encode(idx, 2), 2, 50)


def test_container_roundtrip_palettes_and_interlace():
    rng = random.Random(13)
    for w, h in ((1, 1), (3, 7), (16, 16), (23, 9)):
        for nc in (2, 4, 16, 256):
            pal = bytes(rng.randrange(256) for _ in range(3 * nc))
            idx = bytes(rng.randrange(nc) for _ in range(w * h))
            for il in (False, True):
                got = decode_gif(encode_gif(w, h, idx, pal, interlace=il))
                want = b"".join(pal[3 * i : 3 * i + 3] for i in idx)
                assert got == (w, h, want), (w, h, nc, il)


def test_extensions_are_skipped():
    """A Graphic Control Extension (0x21 0xF9) before the image
    descriptor must be skipped, not break the parse — GIF89a files in
    the wild almost always carry one."""
    pal = bytes(range(12))
    base = encode_gif(2, 2, bytes([0, 1, 2, 3]), pal)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    i = base.index(b"\x2c")  # image descriptor
    patched = base[:i] + gce + base[i:]
    assert decode_gif(patched) == decode_gif(base)


def test_malformed_containers_raise():
    pal = bytes(range(12))
    good = encode_gif(2, 2, bytes([0, 1, 2, 3]), pal)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + good[7:])
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(good[:10])
    # trailer with no image
    hdr_end = 13 + 12  # header + screen descriptor + GCT
    with pytest.raises(ValueError, match="no image"):
        decode_gif(good[:hdr_end] + b"\x3b")
    with pytest.raises(ValueError, match="palette"):
        encode_gif(2, 2, bytes([0, 1, 2, 9]), pal)  # index 9 > 3
    with pytest.raises(ValueError, match="power of two"):
        encode_gif(1, 1, b"\x00", bytes(9))  # 3 colors


def test_local_color_table_wins():
    """An image descriptor carrying a local color table must use it
    over the global one."""
    gpal = bytes([0] * 12)
    lpal = bytes(range(12))
    base = encode_gif(2, 2, bytes([0, 1, 2, 3]), lpal)
    # rebuild: global table = gpal, image gets LCT = lpal
    i = base.index(b"\x2c")
    img = bytearray(base[i:])
    img[9] |= 0x81  # LCT flag + size bits (4 entries → bits=1)
    patched = (
        base[:13] + gpal + bytes(img[:10]) + lpal + bytes(img[10:])
    )
    _, _, rgb = decode_gif(patched)
    assert rgb == b"".join(lpal[3 * i : 3 * i + 3] for i in (0, 1, 2, 3))


def test_decode_pixels_routes_gif():
    from vector_ai_npm_spark.multimodal.binary import decode_pixels

    pal = bytes(range(12))
    gif = encode_gif(2, 2, bytes([3, 2, 1, 0]), pal)
    assert decode_pixels(gif) == decode_gif(gif)


def test_sub_block_boundaries():
    """Payloads large enough to span several 255-byte sub-blocks must
    reassemble exactly."""
    rng = random.Random(99)
    w, h = 64, 64
    pal = bytes(rng.randrange(256) for _ in range(3 * 256))
    idx = bytes(rng.randrange(256) for _ in range(w * h))
    gif = encode_gif(w, h, idx, pal)
    assert gif.count(b"\xff") >= 1  # at least one full 255-byte block
    got = decode_gif(gif)
    assert got[0] == w and got[1] == h
    assert got[2] == b"".join(pal[3 * i : 3 * i + 3] for i in idx)
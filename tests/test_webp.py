"""Wave 32: WebP container parsing + capability gate."""

from __future__ import annotations

import struct

import pytest

from vector_ai_npm_spark.multimodal.webp import (
    decode_webp_auto,
    decode_webp_native,
    encode_webp_header,
    has_native_webp,
    is_webp,
    webp_dims,
)


def test_dims_roundtrip_all_variants():
    """webp_dims(encode_webp_header(w, h, v)) == (w, h, v) across the
    dims grid including both 14-bit edges."""
    for variant in ("vp8", "vp8l", "vp8x"):
        # lossy VP8 stores dims directly in 14 bits (max 16383);
        # VP8L/VP8X store dims-1 (max 16384)
        edge = 16383 if variant == "vp8" else 16384
        for w, h in ((1, 1), (3, 7), (300, 200), (edge, edge)):
            payload = encode_webp_header(w, h, variant)
            assert is_webp(payload)
            assert webp_dims(payload) == (w, h, variant), (variant, w, h)
        with pytest.raises(ValueError, match="dims"):
            encode_webp_header(edge + 1, 5, variant)


def test_chunk_walk_skips_unknown_chunks_with_alignment():
    """An unknown odd-sized chunk before the image chunk must be
    skipped with 2-byte alignment (RIFF padding), not misparse."""
    base = encode_webp_header(33, 44, "vp8l")
    xtra = b"XTRA" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    patched = base[:12] + xtra + base[12:]
    # fix the RIFF size field
    riff_size = len(patched) - 8
    patched = patched[:4] + struct.pack("<I", riff_size) + patched[8:]
    assert webp_dims(patched) == (33, 44, "vp8l")


def test_malformed_containers_raise():
    good = encode_webp_header(10, 10, "vp8")
    with pytest.raises(ValueError, match="not a WebP"):
        webp_dims(b"RIFF1234WAVE" + b"\x00" * 20)
    # truncated VP8 chunk (header cut mid-dims)
    with pytest.raises(ValueError):
        webp_dims(good[:12] + good[12:24])
    # corrupt the VP8 start code
    bad = bytearray(good)
    i = good.index(b"\x9d\x01\x2a")
    bad[i] ^= 0xFF
    with pytest.raises(ValueError, match="start code"):
        webp_dims(bytes(bad))
    # container with no image chunk at all
    with pytest.raises(ValueError, match="no VP8"):
        webp_dims(b"RIFF" + struct.pack("<I", 4) + b"WEBP")
    with pytest.raises(ValueError, match="dims"):
        encode_webp_header(0, 5, "vp8l")
    with pytest.raises(ValueError, match="variant"):
        encode_webp_header(5, 5, "gif")


def test_capability_gate_routes_and_reasons():
    """Without libwebp the auto route must raise NotImplementedError
    (the quarantine signal) AFTER validating the container, naming the
    variant and dims; the native route must refuse with RuntimeError.
    With libwebp present the header-only fixture has no pixel data, so
    native decode failing with a codec error is the expected shape."""
    # Since wave 49 VP8L decodes natively, so a header-only VP8L
    # container is a MALFORMED asset (truncated bitstream → ValueError
    # quarantine), not a capability rejection.
    payload = encode_webp_header(12, 8, "vp8l")
    with pytest.raises(ValueError, match="truncated"):
        decode_webp_auto(payload)
    # The capability seam is now exactly the lossy VP8 variant.
    lossy = encode_webp_header(12, 8, "vp8")
    if has_native_webp():
        with pytest.raises(Exception):
            decode_webp_native(lossy)  # header-only: no bitstream
    else:
        with pytest.raises(RuntimeError, match="requires PIL"):
            decode_webp_native(lossy)
        with pytest.raises(NotImplementedError, match="vp8, 12x8"):
            decode_webp_auto(lossy)
        # a malformed container must fail the VALIDATION path, not
        # reach the capability rejection
        with pytest.raises(ValueError):
            decode_webp_auto(b"RIFF\x04\x00\x00\x00WEBP")


def test_decode_pixels_routes_webp():
    """decode_pixels recognizes the RIFF....WEBP magic and routes to
    the gated decoder instead of the generic unrecognized-format
    error."""
    from vector_ai_npm_spark.multimodal.binary import decode_pixels

    payload = encode_webp_header(5, 5, "vp8")
    if has_native_webp():
        with pytest.raises(Exception):
            decode_pixels(payload)
    else:
        with pytest.raises(NotImplementedError, match="libwebp"):
            decode_pixels(payload)


def test_webp_dims_query_matches_oracle(spark, sf_oracle):
    from vector_ai_npm_spark import registry

    from tests.oracle_harness import compare

    sql = registry.all_oracles()["multimodal_webp_dims"]
    problems = compare(spark, "multimodal_webp_dims", sql, sf_oracle)
    assert not problems, "\n".join(problems)

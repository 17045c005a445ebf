"""Wave 65: JPEG restart intervals + chroma subsampling (codec level)."""

from __future__ import annotations

import numpy as np
import pytest

from vector_ai_npm_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _gradient(w: int, h: int, seed: int) -> bytes:
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    r = np.clip(20 + seed % 60 + 2 * x + y, 0, 255)
    g = np.clip(200 - x - y + seed % 40, 0, 255)
    b = np.clip(40 + x + 2 * y, 0, 255)
    return np.stack(np.broadcast_arrays(r, g, b), -1).astype(np.uint8).tobytes()


def _mae(a: bytes, b: bytes) -> float:
    return float(
        np.abs(
            np.frombuffer(a, np.uint8).astype(int)
            - np.frombuffer(b, np.uint8).astype(int)
        ).mean()
    )


@pytest.mark.parametrize("dims", [(16, 16), (17, 13), (34, 22), (5, 7)])
@pytest.mark.parametrize("sub", [(2, 2), (2, 1), (1, 2)])
def test_subsampled_roundtrip_mae(dims, sub):
    w, h = dims
    pix = _gradient(w, h, w * h)
    dw, dh, dec = decode_jpeg(encode_jpeg(w, h, pix, quality=92, subsampling=sub))
    assert (dw, dh) == (w, h)
    assert _mae(pix, dec) < 4.0


@pytest.mark.parametrize("dims", [(16, 16), (17, 13), (34, 22)])
@pytest.mark.parametrize("dri", [1, 2, 5])
def test_dri_decode_is_byte_identical_to_no_dri(dims, dri):
    """Restart markers only realign/reset — decoded pixels must equal
    the no-DRI encode of the same pixels exactly."""
    w, h = dims
    pix = _gradient(w, h, 3)
    ref = decode_jpeg(encode_jpeg(w, h, pix, quality=92))[2]
    jd = encode_jpeg(w, h, pix, quality=92, restart_interval=dri)
    if dri <= ((w + 7) // 8) * ((h + 7) // 8) - 1:
        assert b"\xff\xd0" in jd or b"\xff\xd1" in jd  # markers actually emitted
    assert decode_jpeg(jd)[2] == ref


def test_dri_with_420_subsampling():
    w, h = 34, 22
    pix = _gradient(w, h, 9)
    ref = decode_jpeg(encode_jpeg(w, h, pix, quality=92, subsampling=(2, 2)))[2]
    jd = encode_jpeg(w, h, pix, quality=92, subsampling=(2, 2), restart_interval=1)
    assert decode_jpeg(jd)[2] == ref


def test_chroma_constant_420_equals_444_exactly():
    """Gray RGB has zero chroma: constant planes are a fixed point of
    box-average/box-replicate, and the luma tiles are the same 8x8
    spatial blocks in both geometries."""
    w, h = 23, 19
    luma = (np.arange(w * h).reshape(h, w) * 3 % 200 + 20).astype(np.uint8)
    pix = np.repeat(luma[..., None], 3, axis=-1).astype(np.uint8).tobytes()
    d444 = decode_jpeg(encode_jpeg(w, h, pix, quality=92))[2]
    d420 = decode_jpeg(encode_jpeg(w, h, pix, quality=92, subsampling=(2, 2)))[2]
    assert d420 == d444


def test_restart_sequence_violation_raises():
    jd = encode_jpeg(34, 22, _gradient(34, 22, 1), quality=92, restart_interval=1)
    i = jd.find(b"\xff\xd0", 200)
    assert i > 0
    bad = jd[:i] + b"\xff\xd4" + jd[i + 2 :]
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(bad)


def test_grayscale_ignores_subsampling_and_survives_dri():
    w, h = 23, 19
    gp = (np.arange(w * h) * 7 % 251).astype(np.uint8).tobytes()
    dw, dh, dec = decode_jpeg(
        encode_jpeg(w, h, gp, color=False, quality=92,
                    subsampling=(2, 2), restart_interval=3)
    )
    assert (dw, dh) == (w, h)
    assert _mae(gp, dec) < 4.0


def test_dri_fuzz_random_pixels_hits_stuffed_pad():
    """Random-pixel DRI roundtrips across sizes/intervals; asserts the
    stuffed-pad-before-RST path (flush lands on 0xFF → FF 00 before the
    marker) is actually exercised, not just tolerated."""
    rng = np.random.default_rng(0)
    hit_stuffed = 0
    for t in range(40):
        w = int(rng.integers(3, 40))
        h = int(rng.integers(3, 40))
        pix = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        sub = [(1, 1), (2, 2), (2, 1), (1, 2)][t % 4]
        dri = int(rng.integers(1, 4))
        ref = decode_jpeg(encode_jpeg(w, h, pix, quality=85, subsampling=sub))[2]
        jd = encode_jpeg(w, h, pix, quality=85, subsampling=sub, restart_interval=dri)
        i = 0
        while True:
            i = jd.find(b"\xff\x00\xff", i + 1)
            if i < 0:
                break
            if i + 3 < len(jd) and 0xD0 <= jd[i + 3] <= 0xD7:
                hit_stuffed += 1
        assert decode_jpeg(jd)[2] == ref
    assert hit_stuffed > 0


def test_bad_options_rejected():
    pix = _gradient(8, 8, 0)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(8, 8, pix, subsampling=(5, 1))
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(8, 8, pix, restart_interval=-1)


def test_variants_face_parity(spark, sf_smoke):
    from tests.oracle_harness import compare
    from vector_ai_npm_spark.registry import all_oracles

    problems = compare(
        spark,
        "multimodal_decode_jpeg_variants",
        all_oracles()["multimodal_decode_jpeg_variants"],
        sf_smoke,
    )
    assert not problems, problems

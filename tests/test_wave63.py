"""Wave 63: ISO-BMFF box walk."""

from __future__ import annotations

import struct

import pytest

from vector_ai_npm_spark.multimodal.mp4 import (
    encode_mp4_skeleton,
    mp4_audit,
)


@pytest.mark.parametrize("v1", [False, True])
@pytest.mark.parametrize("n_tracks", [0, 1, 3])
def test_mp4_roundtrip(v1, n_tracks):
    p = encode_mp4_skeleton(b"mp42", 90000, 123456, n_tracks, mvhd_v1=v1)
    assert mp4_audit(p) == ("mp42", 90000, 123456, n_tracks)


def test_mp4_largesize_box_and_trailing_free_box():
    p = bytearray(encode_mp4_skeleton(b"isom", 1000, 5000, 1))
    # append a size==0 (to-end) free box — must not break the walk
    p += struct.pack(">I", 0) + b"free" + b"\x00" * 16
    assert mp4_audit(bytes(p))[:3] == ("isom", 1000, 5000)
    # rewrite ftyp as a largesize box (size=1 + 64-bit size)
    (sz,) = struct.unpack(">I", p[0:4])
    big = struct.pack(">I", 1) + b"ftyp" + struct.pack(">Q", sz + 8) + bytes(p[8:sz])
    rest = bytes(p[sz:])
    assert mp4_audit(big + rest)[:3] == ("isom", 1000, 5000)


def test_mp4_quarantine_signals():
    with pytest.raises(ValueError, match="ftyp"):
        mp4_audit(b"\x00\x00\x00\x08mdat")
    # fragment with ftyp but no moov (init-segment-less)
    frag = encode_mp4_skeleton(b"isom", 1000, 1, 0)[:24]
    with pytest.raises(ValueError):
        mp4_audit(frag)
    # box overrunning its container
    p = bytearray(encode_mp4_skeleton(b"isom", 1000, 5000, 1))
    i = p.index(b"mvhd") - 4
    p[i : i + 4] = struct.pack(">I", 1 << 30)
    with pytest.raises(ValueError, match="overruns"):
        mp4_audit(bytes(p))
    with pytest.raises(ValueError):
        encode_mp4_skeleton(b"toolong!", 1000, 1, 1)

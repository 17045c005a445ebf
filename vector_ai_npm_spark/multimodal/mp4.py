"""Wave 63: MP4 / ISO-BMFF box structure audit — the video member of
the no-codec container family.

Video is the heaviest asset class a crawl carries, and the triage
questions (how many assets, how many SECONDS — the transcode/frame-
sample capacity unit — which brands, how many tracks) live entirely
in the box tree: `ftyp` (major brand), `moov/mvhd` (timescale +
duration — the spec-authoritative movie duration, ISO 14496-12
§8.2.2), and the `trak` children.  No codec, no sample tables, no
mdat reads — the same pre-decode audit discipline as webp/tiff/pdf.

Box grammar is a 4-byte big-endian size + 4-byte type, nested by
containment; size==1 means a 64-bit largesize follows (handled),
size==0 means to-end-of-file (handled).  mvhd v0 carries 32-bit
timescale/duration at fixed offsets, v1 64-bit — both parsed.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def encode_mp4_skeleton(
    major_brand: bytes,
    timescale: int,
    duration: int,
    n_tracks: int,
    mvhd_v1: bool = False,
) -> bytes:
    """ftyp + moov{mvhd, trak×n} skeleton with spec-valid box framing
    (no media data — the audit reads structure only)."""
    if len(major_brand) != 4 or n_tracks < 0:
        raise ValueError("bad mp4 parameters")

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", major_brand + struct.pack(">I", 0) + b"isom")
    if mvhd_v1:
        mvhd_payload = (
            b"\x01\x00\x00\x00"
            + struct.pack(">QQIQ", 0, 0, timescale, duration)
            + b"\x00" * 80
        )
    else:
        mvhd_payload = (
            b"\x00\x00\x00\x00"
            + struct.pack(">IIII", 0, 0, timescale, duration)
            + b"\x00" * 80
        )
    traks = b"".join(
        box(b"trak", box(b"tkhd", b"\x00" * 84)) for _ in range(n_tracks)
    )
    moov = box(b"moov", box(b"mvhd", mvhd_payload) + traks)
    return ftyp + moov


def mp4_audit(payload: bytes) -> tuple[str, int, int, int]:
    """(major_brand, timescale, duration, n_tracks) from the box tree.
    Raises ValueError on non-BMFF bytes, truncated boxes, or a missing
    moov/mvhd — the quarantine signals (a moov-less fragment means the
    metadata lives in a sibling init segment: route, don't guess)."""
    if len(payload) < 8 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (no leading ftyp)")
    brand = None
    timescale = duration = None
    n_tracks = 0

    def walk(lo: int, hi: int, depth: int) -> None:
        nonlocal brand, timescale, duration, n_tracks
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack(">I", payload[pos : pos + 4])
            typ = payload[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:
                if pos + 16 > hi:
                    raise ValueError("truncated largesize box")
                (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
                body = pos + 16
            elif size == 0:
                size = hi - pos
            if size < 8 or pos + size > hi:
                raise ValueError(f"box {typ!r} overruns its container")
            if typ == b"ftyp":
                brand = payload[body : body + 4].decode("latin-1")
            elif typ == b"mvhd":
                ver = payload[body]
                if ver == 1:
                    timescale, duration = struct.unpack(
                        ">IQ", payload[body + 20 : body + 32]
                    )
                else:
                    timescale, duration = struct.unpack(
                        ">II", payload[body + 12 : body + 20]
                    )
            elif typ == b"trak" and depth == 1:
                n_tracks += 1
            if typ in _CONTAINERS:
                walk(body, pos + size, depth + 1)
            pos += size

    walk(0, len(payload), 0)
    if brand is None or timescale is None:
        raise ValueError(
            "no moov/mvhd box (fragment without init segment) — quarantine"
        )
    return brand, timescale, duration, n_tracks

"""TIFF container dims parsing — the third member of the no-codec
metadata-audit family (WebP wave 32, GIF wave 36).

TIFF pixel data spans many compression schemes (none implemented
here — LZW/PackBits/JPEG-in-TIFF are the documented seam, the same
capability-gate story as WebP), but the HEADER is a tiny fixed
structure: a 2-byte byte-order mark ("II" little / "MM" big endian),
magic 42, an IFD offset, and 12-byte IFD entries keyed by tag.  Width
is tag 256 (ImageWidth), height tag 257 (ImageLength) — inline values
for SHORT/LONG types.  At 100 TB this is the map-only dims/endianness
audit pass over scanned-document corpora (TIFF is the standard archive
scan format) with no codec dependency.

Public spec: TIFF 6.0 (Adobe, 1992).
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def is_tiff(payload: bytes) -> bool:
    return payload[:4] in (b"II*\x00", b"MM\x00*")


def tiff_dims(payload: bytes) -> tuple[int, int, str]:
    """(width, height, endianness) from the first IFD.

    Raises ValueError on malformed headers — the quarantine signal."""
    if len(payload) < 8 or not is_tiff(payload):
        raise ValueError("not a TIFF (bad byte-order mark / magic)")
    little = payload[:2] == b"II"
    endian = "<" if little else ">"
    (ifd_off,) = struct.unpack(endian + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("IFD offset past end of file")
    (n_entries,) = struct.unpack(
        endian + "H", payload[ifd_off : ifd_off + 2]
    )
    w = h = None
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        entry = payload[off : off + 12]
        if len(entry) < 12:
            raise ValueError("truncated IFD entry")
        tag, typ, count = struct.unpack(endian + "HHI", entry[:8])
        if tag in (256, 257):
            if count != 1 or typ not in (3, 4):
                raise ValueError(f"tag {tag}: unsupported type/count")
            if typ == 3:  # SHORT: value in the first 2 bytes
                (val,) = struct.unpack(endian + "H", entry[8:10])
            else:  # LONG
                (val,) = struct.unpack(endian + "I", entry[8:12])
            if tag == 256:
                w = val
            else:
                h = val
    if w is None or h is None:
        raise ValueError("TIFF IFD missing ImageWidth/ImageLength")
    return w, h, "little" if little else "big"


def encode_tiff_header(
    w: int, h: int, little: bool = True, extra_tags: int = 3
) -> bytes:
    """Spec-valid TIFF holding only the first IFD (no strip data) —
    the fixture generator for the dims round-trip.  Width is written
    as LONG, height as SHORT (exercising both inline layouts), plus
    ``extra_tags`` unrelated entries the parser must skip."""
    if not (1 <= w <= 0xFFFFFFFF and 1 <= h <= 0xFFFF):
        raise ValueError("dims out of tag-type range")
    endian = "<" if little else ">"
    out = bytearray(b"II*\x00" if little else b"MM\x00*")
    out += struct.pack(endian + "I", 8)  # IFD right after header
    entries = []
    # BitsPerSample(258), Compression(259)=1, PhotometricInterp(262)
    fillers = ((258, 3, 8), (259, 3, 1), (262, 3, 1))
    tags = [
        (256, 4, w),  # LONG width
        (257, 3, h),  # SHORT height
        *fillers[: max(0, extra_tags)],
    ]
    for tag, typ, val in sorted(tags):
        if typ == 3:
            value_bytes = struct.pack(endian + "H", val) + b"\x00\x00"
        else:
            value_bytes = struct.pack(endian + "I", val)
        entries.append(
            struct.pack(endian + "HHI", tag, typ, 1) + value_bytes
        )
    out += struct.pack(endian + "H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(endian + "I", 0)  # no next IFD
    return bytes(out)

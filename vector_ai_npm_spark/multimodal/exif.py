"""Wave 50: EXIF orientation audit — the rotate-before-train pass.

A real crawl's JPEGs carry display orientation in EXIF (APP1) rather
than in the pixel layout: tag 0x0112 says how the decoded raster must
be flipped/rotated (values 5-8 additionally TRANSPOSE width/height).
A training pipeline that ignores it feeds sideways images to the
vision tower, so the audit pass — per-orientation asset counts and
the transpose volume — runs before any decode capacity is spent,
from header bytes alone (the webp_dims/tiff_dims family).

The EXIF payload is a TIFF stream (II/MM header + IFD0), so parsing
reuses tiff.py's `_read_ifd_values` IFD walker verbatim — both
endiannesses, inline and out-of-line values, unknown tags skipped.
The JPEG side is a plain marker walk to the first APP1 whose body
starts ``Exif\\0\\0`` (stopping at SOS — EXIF precedes entropy data
by spec §4.7.2 of JEITA CP-3451).

Reference scope: §2B north-star (multimodal columns) — the reference
client has no image path; semantics from the public EXIF/TIFF specs.
"""

from __future__ import annotations

import struct

_EXIF_MAGIC = b"Exif\x00\x00"

# EXIF/TIFF tag ids (JEITA CP-3451 table 4)
_TAG_WIDTH = 0x0100
_TAG_HEIGHT = 0x0101
_TAG_ORIENTATION = 0x0112


def encode_jpeg_with_exif(
    w: int,
    h: int,
    orientation: int,
    little: bool = True,
    pad_app0: bool = True,
) -> bytes:
    """A spec-valid JPEG skeleton: SOI, optional JFIF APP0 (the parser
    must skip leading non-EXIF markers), APP1 Exif with a TIFF blob
    holding ImageWidth/ImageLength/Orientation, then EOI.  No entropy
    data — this is the header-audit fixture (the encode_webp_header
    pattern)."""
    if not 1 <= orientation <= 8:
        raise ValueError("EXIF orientation is 1..8")
    if not (1 <= w <= 0xFFFFFFFF and 1 <= h <= 0xFFFF):
        raise ValueError("dims out of tag-type range")
    endian = "<" if little else ">"
    tiff = bytearray(b"II*\x00" if little else b"MM\x00*")
    tiff += struct.pack(endian + "I", 8)
    # width LONG, height SHORT, orientation SHORT (both inline layouts)
    entries = [
        (_TAG_WIDTH, 4, struct.pack(endian + "I", w)),
        (_TAG_HEIGHT, 3, struct.pack(endian + "H", h) + b"\x00\x00"),
        (_TAG_ORIENTATION, 3,
         struct.pack(endian + "H", orientation) + b"\x00\x00"),
    ]
    tiff += struct.pack(endian + "H", len(entries))
    for tag, typ, value in sorted(entries):
        tiff += struct.pack(endian + "HHI", tag, typ, 1) + value
    tiff += struct.pack(endian + "I", 0)

    out = bytearray(b"\xff\xd8")  # SOI
    if pad_app0:
        jfif = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
    body = _EXIF_MAGIC + bytes(tiff)
    out += b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def exif_orientation(jpeg: bytes) -> tuple[int, int, int, str]:
    """(orientation, width, height, endianness) from the first APP1
    Exif segment.  Orientation defaults to 1 when the tag is absent
    (the spec default); a JPEG with NO Exif APP1, or a malformed TIFF
    blob, raises ValueError — the quarantine signal."""
    from vector_ai_npm_spark.multimodal.tiff import _read_ifd_values

    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        body = jpeg[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDA:  # SOS: EXIF must precede entropy data
            break
        if marker == 0xE1 and body[: len(_EXIF_MAGIC)] == _EXIF_MAGIC:
            blob = bytes(body[len(_EXIF_MAGIC):])
            if blob[:2] == b"II":
                endian_ch, name = "<", "little"
            elif blob[:2] == b"MM":
                endian_ch, name = ">", "big"
            else:
                raise ValueError("EXIF TIFF header is neither II nor MM")
            tags = _read_ifd_values(blob, endian_ch)
            orient = tags.get(_TAG_ORIENTATION, [1])[0]
            if not 1 <= orient <= 8:
                raise ValueError(f"EXIF orientation {orient} outside 1..8")
            width = tags.get(_TAG_WIDTH, [0])[0]
            height = tags.get(_TAG_HEIGHT, [0])[0]
            return orient, width, height, name
        pos += 2 + seg_len
    raise ValueError("no Exif APP1 segment before SOS/EOI")


def display_dims(w: int, h: int, orientation: int) -> tuple[int, int]:
    """Post-rotation display dims: orientations 5-8 transpose."""
    return (h, w) if orientation >= 5 else (w, h)

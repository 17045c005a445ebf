"""Pure-Python GIF codec (GIF89a, single frame) — closing the GIF half
of the WebP/GIF seam (round-9; WebP landed as wave 32).

Unlike WebP (entropy-coded bitstreams that genuinely need libwebp),
GIF's compression is LZW — fully implementable in portable Python, the
same codec-parity approach as the PNG matrix (binary.py::_decode_png)
and baseline JPEG (jpeg.py).  Scope:

  * decode — GIF87a/89a, global or local color table, interlaced or
    sequential, extension blocks skipped, full LZW with variable code
    width (up to 12 bits), the KwKwK case, and mid-stream table resets
    via clear codes;
  * encode — single-frame GIF89a with a global color table and dynamic
    LZW (clear-code reset at table overflow), optional interlace —
    the fixture generator for the round-trip oracle.

LZW width discipline (derived, then property-tested round-trip): the
DECODER bumps code width when its table size reaches 2^width (the next
code on the wire could equal the table size, via KwKwK); the ENCODER —
whose table runs exactly one entry ahead — bumps when next_code ==
2^width + 1.  At 4096 entries the encoder emits a clear and resets;
the decoder stops adding entries until it sees that clear.

Reference scope: §2B north-star (multimodal columns) — the reference
client has no image path; format semantics from the public GIF89a
specification.
"""

from __future__ import annotations

import struct

_GIF_SIGS = (b"GIF87a", b"GIF89a")
_MAX_CODE = 1 << 12
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_rows(h: int) -> list[int]:
    rows: list[int] = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


# --------------------------------------------------------------------------
# LZW (GIF variant): LSB-first bit packing, variable width 3..12
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def lzw_encode(idx: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW over an index stream → packed code bytes
    (caller sub-blocks them)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def fresh() -> tuple[dict, int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    bw.write(clear, width)
    cur = b""
    for px in idx:
        nxt = cur + bytes([px])
        if nxt in table:
            cur = nxt
            continue
        bw.write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == _MAX_CODE + 1:
            bw.write(clear, width)
            table, next_code, width = fresh()
        cur = bytes([px])
    if cur:
        bw.write(table[cur], width)
        # the decoder ADDS an entry while processing this final code
        # (its table lags ours by one); if that addition reaches
        # 2^width, it reads the NEXT code — the EOI — at width+1, so
        # mirror the bump here even though we assign nothing
        if next_code == (1 << width) and width < 12:
            width += 1
    bw.write(eoi, width)
    return bw.flush()


def lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytes:
    """Inverse of :func:`lzw_encode`; raises ValueError on malformed
    streams (bad codes, missing EOI, overrun past max_pixels)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = bytearray()

    def fresh() -> tuple[dict, int, int]:
        return (
            {i: bytes([i]) for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    prev: bytes | None = None
    while True:
        code = br.read(width)
        if code == clear:
            table, next_code, width = fresh()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code not in table:
                raise ValueError(f"GIF LZW: bad first code {code}")
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError(f"GIF LZW: code {code} out of range")
            if next_code < _MAX_CODE:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        out += entry
        if len(out) > max_pixels:
            raise ValueError("GIF LZW: more pixels than image area")
        prev = entry
    return bytes(out)


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------


def encode_gif(
    w: int,
    h: int,
    idx: bytes,
    palette: bytes,
    interlace: bool = False,
) -> bytes:
    """Single-frame GIF89a: global color table from ``palette``
    (3n bytes, n a power of two ≥ 2), index image ``idx`` (one byte
    per pixel, row-major)."""
    n_colors = len(palette) // 3
    if len(palette) % 3 or n_colors < 2 or n_colors & (n_colors - 1):
        raise ValueError("palette must be 3n bytes, n a power of two >= 2")
    if len(idx) != w * h:
        raise ValueError(f"want {w * h} index bytes, got {len(idx)}")
    if idx and max(idx) >= n_colors:
        raise ValueError("index out of palette range")
    gct_bits = max(1, n_colors.bit_length() - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (gct_bits - 1))  # GCT flag + size
    out += b"\x00\x00"  # bg index, aspect
    out += palette
    out.append(0x2C)  # image descriptor
    out += struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlace else 0x00)
    if interlace:
        rows = _interlace_rows(h)
        idx = b"".join(idx[r * w : (r + 1) * w] for r in rows)
    mcs = max(2, gct_bits)
    out.append(mcs)
    packed = lzw_encode(idx, mcs)
    for i in range(0, len(packed), 255):
        block = packed[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, RGB bytes) from a single-frame GIF."""
    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer before any image
            raise ValueError("GIF has no image data")
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated extension block")
                ln = payload[pos]
                pos += 1 + ln
                if ln == 0:
                    break
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        # image descriptor
        left, top, w, h = struct.unpack("<HHHH", payload[pos : pos + 8])
        iflags = payload[pos + 8]
        pos += 9
        interlaced = bool(iflags & 0x40)
        pal = gct
        if iflags & 0x80:  # local color table wins
            n = 2 << (iflags & 0x07)
            pal = payload[pos : pos + 3 * n]
            if len(pal) < 3 * n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if not pal:
            raise ValueError("GIF image has no color table")
        mcs = payload[pos]
        pos += 1
        if not (2 <= mcs <= 11):
            raise ValueError(f"bad LZW min code size {mcs}")
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated image data")
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            data += payload[pos : pos + ln]
            pos += ln
        idx = lzw_decode(bytes(data), mcs, w * h)
        if len(idx) != w * h:
            raise ValueError(
                f"GIF pixel count {len(idx)} != {w}x{h}"
            )
        if interlaced:
            rows = _interlace_rows(h)
            out_rows: list[bytes] = [b""] * h
            for seq, r in enumerate(rows):
                out_rows[r] = idx[seq * w : (seq + 1) * w]
            idx = b"".join(out_rows)
        n_pal = len(pal) // 3
        if max(idx, default=0) >= n_pal:
            raise ValueError("GIF index out of palette range")
        rgb = b"".join(pal[3 * i : 3 * i + 3] for i in idx)
        return w, h, rgb
    raise ValueError("GIF ended without image data")

"""Baseline JPEG codec in pure Python + numpy (ITU-T T.81 "baseline
sequential DCT": SOI/DQT/SOF0/DHT/SOS/EOI, standard Annex K quantization
and Huffman tables, 8-bit samples).

Why this exists: the multimodal decode face treats compressed codecs as
a library seam — but baseline JPEG, like PNG (see binary._decode_png),
needs nothing this container lacks: the entropy layer is canonical
Huffman (pure Python), the transform is an 8×8 DCT-II (one numpy
einsum), and the color transform is three affine maps. So the common
case of real-world training images decodes natively — including
progressive SOF2 (round 10, multimodal/jpeg_progressive.py: spectral
selection + successive approximation, routed transparently from this
module's marker walk), restart intervals (DRI + RST0..7, round 11)
and any integer-ratio chroma subsampling grid (4:2:0 / 4:2:2 / 4:4:0,
round 11 — the encoder emits them too, so the variants are
roundtrip-tested); only the remaining exotic rungs (arithmetic coding,
12-bit precision) raise the documented NotImplementedError.

Encoder and decoder share the standard tables, so the pair is
self-consistent by construction and the roundtrip contract (dims exact,
bounded reconstruction error — JPEG is lossy) is what the registry
query `multimodal_decode_jpeg` pins cross-engine as booleans.

Scale shape: both directions run inside the same Arrow-batched
mapInPandas stages as every other codec here — payload bytes never
shuffle, and block math is vectorized across each image's blocks.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Standard tables (T.81 Annex K) and derived structures
# ---------------------------------------------------------------------------


def _zigzag() -> list[tuple[int, int]]:
    order: list[tuple[int, int]] = []
    for s in range(15):
        idx = range(s + 1)
        for i in (reversed(idx) if s % 2 == 0 else idx):
            r, c = i, s - i
            if r < 8 and c < 8:
                order.append((r, c))
    return order


_ZZ = _zigzag()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

_QT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_QT_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)

_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """val -> (code, length), canonical assignment per T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> val, for the bit-at-a-time decoder."""
    return {
        (length, code): val
        for val, (code, length) in _huff_codes(bits, vals).items()
    }


# orthonormal 8-point DCT-II matrix
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables."""
    q = max(1, min(100, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    out = []
    for t in (_QT_LUM, _QT_CHROM):
        s = np.floor((t * scale + 50) / 100)
        out.append(np.clip(s, 1, 255))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# bit I/O with 0xFF byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.bytes = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self.bytes.append(b)
            if b == 0xFF:
                self.bytes.append(0x00)  # stuffing
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self._pos >= len(self._data):
                raise ValueError("JPEG entropy stream exhausted")
            b = self._data[self._pos]
            self._pos += 1
            if b == 0xFF:
                if self._pos >= len(self._data):
                    raise ValueError("truncated JPEG stuffing")
                m = self._data[self._pos]
                self._pos += 1
                if 0xD0 <= m <= 0xD7:
                    raise ValueError(
                        f"unexpected restart marker RST{m - 0xD0} mid-MCU "
                        "(desynchronized scan)"
                    )
                if m != 0x00:
                    raise NotImplementedError(
                        f"marker 0xFF{m:02X} inside scan"
                    )
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def align_restart(self) -> int:
        """Restart-interval boundary: discard the pad bits of the
        current byte, consume the RSTn marker, return n (0..7).  The
        caller checks the modulo-8 sequence and resets DC predictors
        (T.81 E.2.4 / F.2.1.3.1)."""
        self._n = 0  # byte-align: pad bits are 1-fill, never data
        # 1-fill padding that lands on 0xFF is byte-stuffed (FF 00), and
        # encoders may emit 0xFF fill bytes before a marker (T.81 B.1.1.2)
        # — both are legal prefixes of the RSTn marker, skip them.
        while self._pos + 1 < len(self._data):
            if (
                self._data[self._pos] == 0xFF
                and self._data[self._pos + 1] == 0x00
            ):
                self._pos += 2
                continue
            if (
                self._data[self._pos] == 0xFF
                and self._data[self._pos + 1] == 0xFF
            ):
                self._pos += 1
                continue
            break
        if self._pos + 2 > len(self._data):
            raise ValueError("truncated JPEG: missing restart marker")
        if self._data[self._pos] != 0xFF or not (
            0xD0 <= self._data[self._pos + 1] <= 0xD7
        ):
            raise ValueError(
                "expected JPEG restart marker, found "
                f"{self._data[self._pos:self._pos + 2].hex()}"
            )
        n = self._data[self._pos + 1] - 0xD0
        self._pos += 2
        return n

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid JPEG Huffman code")

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = 0
        for _ in range(s):
            v = (v << 1) | self.read_bit()
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _magnitude(v: int) -> tuple[int, int]:
    """(category, code-bits) for DC-diff/AC coefficient v."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _encode_block(
    writer: _BitWriter,
    coefs: np.ndarray,
    pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    zz = coefs[_ZZ_ROWS, _ZZ_COLS].astype(int)
    s, code = _magnitude(int(zz[0]) - pred)
    c, ln = dc_tab[s]
    writer.write(c, ln)
    if s:
        writer.write(code, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_tab[0xF0]  # ZRL
            writer.write(c, ln)
            run -= 16
        s, code = _magnitude(v)
        c, ln = ac_tab[(run << 4) | s]
        writer.write(c, ln)
        writer.write(code, s)
        run = 0
    if last_nz != 63:
        c, ln = ac_tab[0x00]  # EOB
        writer.write(c, ln)
    return int(zz[0])


def _component_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge replicate), DCT + quantize every block.
    Returns (n_by, n_bx, 8, 8) int32 quantized coefficients."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    H, W = p.shape
    blocks = p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    dct = np.einsum("ij,abjk,lk->abil", _C, blocks, _C)
    return np.round(dct / qt).astype(np.int32)


def encode_jpeg(
    w: int,
    h: int,
    pixels: bytes,
    color: bool = True,
    quality: int = 90,
    subsampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Encode RGB (color=True, len = w*h*3) or grayscale (len = w*h)
    pixels as a baseline JFIF JPEG, standard tables, quality per the
    IJG scaling.  `subsampling=(hs, vs)` sets the LUMA sampling factors
    (chroma stays 1x1): (1,1)=4:4:4, (2,2)=4:2:0, (2,1)=4:2:2,
    (1,2)=4:4:0 — chroma planes are box-averaged down and emitted in
    the interleaved T.81 A.2.3 MCU order the decoder walks.
    `restart_interval` > 0 writes a DRI segment and RST0..7 markers
    every N MCUs (byte-aligned, DC predictors reset) — the two
    most common real-crawl baseline variants (r10 verdict item 3)."""
    nch = 3 if color else 1
    if len(pixels) != w * h * nch:
        raise ValueError(f"want {w * h * nch} pixel bytes, got {len(pixels)}")
    hs, vs = subsampling
    if not color:
        hs = vs = 1
    if not (1 <= hs <= 4 and 1 <= vs <= 4):
        raise ValueError(f"bad subsampling factors {subsampling}")
    if not (0 <= restart_interval <= 0xFFFF):
        raise ValueError(f"bad restart interval {restart_interval}")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, nch).astype(
        np.float64
    )
    qlum, qchrom = _quality_tables(quality)
    if color:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [arr[..., 0]]

    # pad every full-res plane to the MCU grid (edge replicate), then
    # box-average chroma down by the luma factors — the decoder's
    # box-replicate upsample is this operation's right inverse
    n_mx = (w + 8 * hs - 1) // (8 * hs)
    n_my = (h + 8 * vs - 1) // (8 * vs)
    gw, gh = n_mx * 8 * hs, n_my * 8 * vs
    planes = [
        np.pad(p, ((0, gh - h), (0, gw - w)), mode="edge") for p in planes
    ]
    if color and (hs > 1 or vs > 1):
        planes[1:] = [
            p.reshape(gh // vs, vs, gw // hs, hs).mean(axis=(1, 3))
            for p in planes[1:]
        ]
    samp_of = [(hs, vs)] + [(1, 1)] * (nch - 1)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )  # APP0, density 1:1, no thumbnail
    for tid, qt in ((0, qlum), (1, qchrom))[: (2 if color else 1)]:
        zz = qt[_ZZ_ROWS, _ZZ_COLS].astype(int)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(zz.tolist())
    ncomp = 3 if color else 1
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        chs, cvs = samp_of[cid - 1]
        out += struct.pack(
            "BBB", cid, (chs << 4) | cvs, 0 if cid == 1 else 1
        )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    huffs = [
        (0x00, _DC_LUM_BITS, _DC_LUM_VALS),
        (0x10, _AC_LUM_BITS, _AC_LUM_VALS),
    ] + (
        [
            (0x01, _DC_CHROM_BITS, _DC_CHROM_VALS),
            (0x11, _AC_CHROM_BITS, _AC_CHROM_VALS),
        ]
        if color
        else []
    )
    for tc, bits, vals in huffs:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        out += struct.pack("BB", cid, 0x00 if cid == 1 else 0x11)
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0

    dc_lum = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chrom = _huff_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac_chrom = _huff_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)

    comp_blocks = [
        _component_blocks(p, qlum if i == 0 else qchrom)
        for i, p in enumerate(planes)
    ]
    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_i = 0
    rst_seq = 0
    for my in range(n_my):
        for mx in range(n_mx):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                # byte-align (1-fill; _BitWriter stuffs a pad byte that
                # lands on 0xFF), emit RSTn raw, reset DC predictors
                writer.flush()
                writer.bytes += bytes((0xFF, 0xD0 + rst_seq))
                rst_seq = (rst_seq + 1) & 7
                preds = [0] * ncomp
            for ci in range(ncomp):
                chs, cvs = samp_of[ci]
                dc_t = dc_lum if ci == 0 else dc_chrom
                ac_t = ac_lum if ci == 0 else ac_chrom
                for vy in range(cvs):
                    for vx in range(chs):
                        preds[ci] = _encode_block(
                            writer,
                            comp_blocks[ci][my * cvs + vy, mx * chs + vx],
                            preds[ci],
                            dc_t,
                            ac_t,
                        )
            mcu_i += 1
    writer.flush()
    out += writer.bytes
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, RGB-or-gray pixel bytes) for baseline sequential
    JPEG: any h×v sampling grid (4:4:4, 4:2:0, 4:2:2, 4:4:0 — the MCU
    walk is the general interleaved T.81 A.2.3 geometry, subsampled
    planes box-replicated back to full resolution) and restart
    intervals (DRI + RSTn: byte-realign, modulo-8 sequence check, DC
    predictor reset — round 11; the two most common real-crawl
    variants per the r10 verdict).  Progressive SOF2 streams route to
    jpeg_progressive.decode_jpeg_progressive.  Arithmetic coding and
    12-bit precision raise NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    i = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    w = h = None
    comps: list[tuple[int, int, int, int]] = []  # (cid, h_i, v_i, tq)
    scan: list[tuple[int, int, int]] = []  # (cid, td, ta)
    data_start = None
    dri = 0  # restart interval in MCUs; 0 = none
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", payload, i + 2)[0]
        seg = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                t = np.zeros((8, 8))
                t[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(
                    seg[j + 1 : j + 65], dtype=np.uint8
                )
                qts[tq] = t
                j += 65
        elif marker == 0xC0:
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if _prec != 8:
                raise NotImplementedError("12-bit JPEG")
            for c in range(nc):
                cid, samp, tq = struct.unpack_from("BBB", seg, 6 + 3 * c)
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"bad JPEG sampling factors {samp:#x}")
                comps.append((cid, hi, vi, tq))
        elif marker == 0xC2:
            # progressive DCT: its own multi-scan decode loop
            from vector_ai_npm_spark.multimodal.jpeg_progressive import (
                decode_jpeg_progressive,
            )

            return decode_jpeg_progressive(payload)
        elif marker in (0xC1, 0xC3, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (only baseline SOF0 and "
                "progressive SOF2 supported)"
            )
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nv])
                tab = _huff_decode_map(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                j += 17 + nv
        elif marker == 0xDD:
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:
            ns = seg[0]
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cid, tt >> 4, tt & 0x0F))
            data_start = i + 2 + seg_len
            break
        i += 2 + seg_len
    if w is None or data_start is None:
        raise ValueError("JPEG missing SOF0/SOS")
    end = payload.rfind(b"\xff\xd9")
    reader = _BitReader(payload[data_start : end if end > 0 else len(payload)])

    ncomp = len(comps)
    if len(scan) != ncomp:
        raise NotImplementedError(
            "non-interleaved baseline scan (SOS components != frame "
            "components)"
        )
    hmax = max(hi for _c, hi, _v, _t in comps)
    vmax = max(vi for _c, _h, vi, _t in comps)
    n_mx = (w + 8 * hmax - 1) // (8 * hmax)
    n_my = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((n_my * 8 * vi, n_mx * 8 * hi))
        for _c, hi, vi, _t in comps
    ]
    preds = [0] * ncomp
    tq_of = {cid: tq for cid, _h, _v, tq in comps}
    td_of = {cid: (td, ta) for cid, td, ta in scan}
    mcu_i = 0
    rst_seq = 0
    for my in range(n_my):
        for mx in range(n_mx):
            if dri and mcu_i and mcu_i % dri == 0:
                n = reader.align_restart()
                if n != rst_seq:
                    raise ValueError(
                        f"restart marker out of sequence: RST{n}, "
                        f"expected RST{rst_seq}"
                    )
                rst_seq = (rst_seq + 1) & 7
                preds = [0] * ncomp
            for ci, (cid, hi, vi, _tq) in enumerate(comps):
                td, ta = td_of[cid]
                for vy in range(vi):
                    for vx in range(hi):
                        s = reader.read_huff(dc_tabs[td])
                        diff = reader.receive_extend(s)
                        preds[ci] += diff
                        zz = np.zeros(64)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.read_huff(ac_tabs[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            zz[k] = reader.receive_extend(s)
                            k += 1
                        coefs = np.zeros((8, 8))
                        coefs[_ZZ_ROWS, _ZZ_COLS] = zz
                        block = (
                            _C.T @ (coefs * qts[tq_of[cid]]) @ _C + 128.0
                        )
                        py = (my * vi + vy) * 8
                        px = (mx * hi + vx) * 8
                        planes[ci][py : py + 8, px : px + 8] = block
            mcu_i += 1
    # box-replicate subsampled planes back to the full sampling grid,
    # then crop to the frame rect
    up = []
    for (cid, hi, vi, _tq), p in zip(comps, planes):
        if hmax % hi or vmax % vi:
            raise NotImplementedError(
                f"non-integer sampling ratio {hi}x{vi} vs {hmax}x{vmax}"
            )
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        up.append(p[:h, :w])
    planes = up
    if ncomp == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, out.tobytes()
    if ncomp != 3:
        raise NotImplementedError(f"JPEG with {ncomp} components")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# native (libjpeg) route — capability-gated, pure-Python codec as fallback
# ---------------------------------------------------------------------------

_PIL_IMAGE = None  # resolved module, or False after a failed probe


def split_jpeg_tables(payload: bytes) -> tuple[bytes, bytes]:
    """Split a complete JPEG into (tables_stream, abbreviated_stream)
    per TIFF 6.0 TechNote 2 — the JPEG-in-TIFF (Compression=7) layout:
    the tables stream is ``SOI + DQT/DHT/DRI + EOI`` (what the
    JPEGTables tag 347 carries, shared by every strip), and the
    abbreviated stream is ``SOI + SOF/SOS + entropy data + EOI`` (one
    per strip).  Concatenating ``SOI + tables_body + abbrev[2:]``
    reconstitutes a decodable stream — the exact merge
    :func:`vector_ai_npm_spark.multimodal.tiff.decode_tiff` performs."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    tables = bytearray(b"\xff\xd8")
    image = bytearray(b"\xff\xd8")
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        marker = payload[i + 1]
        if marker == 0xDA:  # SOS: segment + entropy data through EOI
            image += payload[i:]
            tables += b"\xff\xd9"
            return bytes(tables), bytes(image)
        (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
        seg = payload[i : i + 2 + seg_len]
        if marker in (0xDB, 0xC4, 0xDD):  # DQT / DHT / DRI
            tables += seg
        else:
            image += seg
        i += 2 + seg_len
    raise ValueError("no SOS marker found")


def has_native_jpeg() -> bool:
    """Capability gate for the libjpeg-backed decode route (the
    has_tws_support pattern, streaming/stateful.py:90): PIL wraps
    libjpeg-turbo, whose SIMD Huffman+IDCT is the production decode
    path — ~10-100× the pure-Python codec's ~8 ms/image measured cost
    (BASELINE.md §4i) and it handles every rung the pure codec declines
    (progressive, subsampled chroma, restart intervals, 12-bit).  When
    PIL is absent (this container) every caller falls back to
    :func:`decode_jpeg`, which stays the bit-pinned oracle reference
    either way."""
    global _PIL_IMAGE
    if _PIL_IMAGE is None:
        try:
            from PIL import Image as _img

            _PIL_IMAGE = _img
        except ImportError:
            _PIL_IMAGE = False
    return _PIL_IMAGE is not False


def decode_jpeg_native(payload: bytes) -> tuple[int, int, bytes]:
    """libjpeg decode with the exact contract of :func:`decode_jpeg`:
    (width, height, RGB-or-gray pixel bytes).  1-component scans stay
    8-bit gray ('L'); everything else normalizes to RGB so downstream
    consumers (resize, dHash, MAE contracts) see the same byte layout
    from both routes.  Raises RuntimeError when the capability probe
    failed — callers route through :func:`decode_jpeg_auto`."""
    import io

    if not has_native_jpeg():
        raise RuntimeError(
            "decode_jpeg_native requires PIL; route via decode_jpeg_auto"
        )
    img = _PIL_IMAGE.open(io.BytesIO(payload))
    if img.mode not in ("L", "RGB"):
        img = img.convert("RGB")
    w, h = img.size
    return w, h, img.tobytes()


def decode_jpeg_auto(payload: bytes) -> tuple[int, int, bytes]:
    """The decode entry point callers should use: native libjpeg when
    importable, else the pure-Python baseline codec.  Both emit the
    identical (w, h, bytes) contract; JPEG being lossy-DEcode-exact
    (ISO/IEC 10918 pins the decoder, not the encoder) the two routes
    agree bit-for-bit on baseline streams up to IDCT rounding, which is
    why the registry oracle's MAE bound holds under either."""
    if has_native_jpeg():
        return decode_jpeg_native(payload)
    return decode_jpeg(payload)

"""Progressive JPEG (SOF2) codec in pure Python + numpy — closing the
round-9 verdict's item 1 (the largest decodable class of real crawl
assets that still quarantined).

Scope mirrors the baseline codec (multimodal/jpeg.py): 8-bit samples,
4:4:4 sampling, Huffman entropy coding.  Both halves of T.81 Annex G's
progressive toolbox are implemented, because real encoders (libjpeg's
standard scan script) use both:

  * **spectral selection** — each AC scan carries one Ss..Se band of
    one component; DC scans may interleave all components;
  * **successive approximation** — first scans deliver coefficients at
    reduced precision (point transform Al), refinement scans
    (Ah = Al+1) deliver one magnitude bit each: DC refinement is one
    raw bit per block; AC refinement interleaves newly-significant
    ±1·2^Al codes with correction bits for already-nonzero history
    coefficients, with EOB-run folding (EOBn codes, runs ≤ 32767)
    across blocks.

The ENCODER exists to make the decode face testable end-to-end without
external assets (the GIF/TIFF pattern): it emits the standard-shaped
scan script (DC first at Al=1 → per-component AC bands at Al≥1 →
DC refinement → per-component AC refinements down to Al=0), using
flat fixed Huffman tables (every (run,size) symbol at one canonical
length — valid, deliberately not frequency-optimized; the decode path
never depends on which valid tables the wire carries).

After all scans the coefficient store is identical to what a baseline
scan would have delivered, so dequant + IDCT + color transform are
shared with jpeg.py and the decoded bytes are BIT-IDENTICAL to
decoding the same coefficients from a baseline stream — pinned by
tests/test_jpeg_progressive.py.

Restart intervals (DRI + RST0..7) are supported in every scan type as
of r12 — encoder emits them per scan, decoder realigns/resets at each
boundary (the r11 baseline-DRI machinery, T.81 E.2.4, applied to
Annex G scans; an EOB run never crosses a restart).  Subsampled chroma
and 12-bit remain the documented seam (NotImplementedError →
quarantine), as in the baseline decoder.

Public spec: ITU-T T.81 (1992) Annex G (progressive DCT), G.1.2.2
(AC first scans / EOB runs), G.1.2.3 (AC refinement), E.2.4 (restart
intervals).
"""

from __future__ import annotations

import struct

import numpy as np

from vector_ai_npm_spark.multimodal.jpeg import (
    _C,
    _ZZ_COLS,
    _ZZ_ROWS,
    _BitReader,
    _BitWriter,
    _component_blocks,
    _huff_codes,
    _huff_decode_map,
    _magnitude,
    _quality_tables,
)

# ---------------------------------------------------------------------------
# flat fixed Huffman tables: every symbol the progressive encoder can
# emit, one canonical length each (DC: 12 symbols @ 4 bits; AC: all
# (run 0..15) x (size 0..10) @ 9 bits — covers EOBn n<=14 and ZRL)
# ---------------------------------------------------------------------------

_P_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_P_DC_VALS = list(range(12))
_P_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]
_P_AC_BITS = [0] * 16
_P_AC_BITS[8] = len(_P_AC_VALS)  # all at length 9

_ENC_DC = _huff_codes(_P_DC_BITS, _P_DC_VALS)
_ENC_AC = _huff_codes(_P_AC_BITS, _P_AC_VALS)

_MAX_EOBRUN = 0x7FFF


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _ScanWriter:
    """Per-scan entropy writer: bit writer + lazy EOB-run state with
    the correction-bit buffer AC refinement scans carry across blocks.

    ``restart_interval`` > 0 arms the T.81 E.2.4 restart machinery:
    every Ri MCUs the writer flushes the EOB run (a run may not cross
    a restart boundary, G.1.2.2), byte-aligns with 1-fill, emits the
    RSTn marker raw, and resets whatever DC predictors the caller
    hands it — the same discipline as the baseline encoder
    (jpeg.py:468-474), applied per scan."""

    def __init__(self, restart_interval: int = 0) -> None:
        self.bw = _BitWriter()
        self.eobrun = 0
        self.pending_bits: list[int] = []
        self.ri = restart_interval
        self.mcu = 0
        self.rst_seq = 0

    def mcu_boundary(self, preds: list[int] | None = None) -> None:
        """Call before each MCU; handles the restart boundary."""
        if self.ri and self.mcu and self.mcu % self.ri == 0:
            self.flush_eobrun()
            self.bw.flush()
            self.bw.bytes += bytes((0xFF, 0xD0 + self.rst_seq))
            self.rst_seq = (self.rst_seq + 1) & 7
            if preds is not None:
                for i in range(len(preds)):
                    preds[i] = 0
        self.mcu += 1

    def huff(self, table: dict[int, tuple[int, int]], sym: int) -> None:
        code, ln = table[sym]
        self.bw.write(code, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            self.huff(_ENC_AC, n << 4)
            if n:
                self.bw.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for b in self.pending_bits:
            self.bw.write(b, 1)
        self.pending_bits = []

    def finish(self) -> bytes:
        self.flush_eobrun()
        self.bw.flush()
        return bytes(self.bw.bytes)


def _encode_dc_first(
    sw: _ScanWriter, blocks: list[np.ndarray], preds: list[int],
    order: list[int], n_by: int, n_bx: int, al: int,
) -> None:
    for by in range(n_by):
        for bx in range(n_bx):
            sw.mcu_boundary(preds)
            for ci in order:
                v = int(blocks[ci][by, bx, 0]) >> al  # arithmetic shift
                s, code = _magnitude(v - preds[ci])
                sw.huff(_ENC_DC, s)
                if s:
                    sw.bw.write(code, s)
                preds[ci] = v


def _encode_dc_refine(
    sw: _ScanWriter, blocks: list[np.ndarray],
    order: list[int], n_by: int, n_bx: int, al: int,
) -> None:
    for by in range(n_by):
        for bx in range(n_bx):
            sw.mcu_boundary()
            for ci in order:
                sw.bw.write((int(blocks[ci][by, bx, 0]) >> al) & 1, 1)


def _encode_ac_first(
    sw: _ScanWriter, comp: np.ndarray, ss: int, se: int, al: int
) -> None:
    n_by, n_bx = comp.shape[:2]
    for by in range(n_by):
        for bx in range(n_bx):
            sw.mcu_boundary()
            zz = comp[by, bx]
            band = [
                (v >> al) if v >= 0 else -((-v) >> al)
                for v in (int(zz[k]) for k in range(ss, se + 1))
            ]
            last_nz = -1
            for i in range(len(band) - 1, -1, -1):
                if band[i]:
                    last_nz = i
                    break
            if last_nz < 0:
                sw.eobrun += 1
                if sw.eobrun == _MAX_EOBRUN:
                    sw.flush_eobrun()
                continue
            sw.flush_eobrun()
            run = 0
            for i in range(last_nz + 1):
                v = band[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    sw.huff(_ENC_AC, 0xF0)
                    run -= 16
                s, code = _magnitude(v)
                sw.huff(_ENC_AC, (run << 4) | s)
                sw.bw.write(code, s)
                run = 0
            if last_nz != len(band) - 1:
                sw.eobrun += 1
                if sw.eobrun == _MAX_EOBRUN:
                    sw.flush_eobrun()


def _encode_ac_refine(
    sw: _ScanWriter, comp: np.ndarray, ss: int, se: int, al: int
) -> None:
    n_by, n_bx = comp.shape[:2]
    for by in range(n_by):
        for bx in range(n_bx):
            sw.mcu_boundary()
            zz = comp[by, bx]
            absval = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            signs = [1 if int(zz[k]) >= 0 else -1 for k in range(ss, se + 1)]
            eob = -1  # last NEWLY-significant position
            for i, t in enumerate(absval):
                if t == 1:
                    eob = i
            r = 0
            br: list[int] = []
            for i, t in enumerate(absval):
                if t == 0:
                    r += 1
                    continue
                # ZRLs that cannot fold into the EOB run
                while r > 15 and i <= eob:
                    sw.flush_eobrun()
                    sw.huff(_ENC_AC, 0xF0)
                    r -= 16
                    for b in br:
                        sw.bw.write(b, 1)
                    br = []
                if t > 1:  # history coefficient: buffer its next bit
                    br.append(t & 1)
                    continue
                # newly significant: run code + sign + buffered bits
                sw.flush_eobrun()
                sw.huff(_ENC_AC, (r << 4) | 1)
                sw.bw.write(1 if signs[i] > 0 else 0, 1)
                for b in br:
                    sw.bw.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                sw.eobrun += 1
                sw.pending_bits.extend(br)
                if sw.eobrun == _MAX_EOBRUN:
                    sw.flush_eobrun()


def _sos(components: list[tuple[int, int, int]], ss: int, se: int,
         ah: int, al: int) -> bytes:
    out = bytearray(b"\xff\xda")
    out += struct.pack(">HB", 6 + 2 * len(components), len(components))
    for cid, td, ta in components:
        out += struct.pack("BB", cid, (td << 4) | ta)
    out += struct.pack("BBB", ss, se, (ah << 4) | al)
    return bytes(out)


def encode_jpeg_progressive(
    w: int, h: int, pixels: bytes, color: bool = True, quality: int = 90,
    restart_interval: int = 0,
) -> bytes:
    """Encode RGB/grayscale pixels as a progressive (SOF2) JFIF JPEG
    using the standard-shaped scan script (module docstring).

    ``restart_interval`` > 0 writes a DRI segment and emits RST0..7
    markers every that-many MCUs in EVERY scan (r12: progressive+DRI
    is common in real crawls — libjpeg's progressive scan script under
    -restart; the baseline codec got DRI in r11, jpeg.py:432)."""
    nch = 3 if color else 1
    if not (0 <= restart_interval <= 0xFFFF):
        raise ValueError(f"bad restart interval {restart_interval}")
    if len(pixels) != w * h * nch:
        raise ValueError(f"want {w * h * nch} pixel bytes, got {len(pixels)}")
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
    ncomp = len(planes)
    # quantized blocks, flattened to zigzag vectors (n_by, n_bx, 64)
    blocks = []
    for i, p in enumerate(planes):
        qb = _component_blocks(p, qlum if i == 0 else qchrom)
        blocks.append(qb[:, :, _ZZ_ROWS, _ZZ_COLS].astype(np.int64))
    n_by, n_bx = blocks[0].shape[:2]

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, qt in ((0, qlum), (1, qchrom))[: (2 if color else 1)]:
        zz = qt[_ZZ_ROWS, _ZZ_COLS].astype(int)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(zz.tolist())
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        out += struct.pack("BBB", cid, 0x11, 0 if cid == 1 else 1)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # one flat DC table (id 0) and one flat AC table (id 0), shared
    out += b"\xff\xc4" + struct.pack(
        ">HB", 3 + 16 + len(_P_DC_VALS), 0x00
    ) + bytes(_P_DC_BITS) + bytes(_P_DC_VALS)
    out += b"\xff\xc4" + struct.pack(
        ">HB", 3 + 16 + len(_P_AC_VALS), 0x10
    ) + bytes(_P_AC_BITS) + bytes(_P_AC_VALS)

    all_comps = [(cid, 0, 0) for cid in range(1, ncomp + 1)]
    preds = [0] * ncomp

    def dc_first(al: int) -> bytes:
        sw = _ScanWriter(restart_interval)
        _encode_dc_first(
            sw, blocks, preds, list(range(ncomp)), n_by, n_bx, al
        )
        return _sos(all_comps, 0, 0, 0, al) + sw.finish()

    def dc_refine(al: int) -> bytes:
        sw = _ScanWriter(restart_interval)
        _encode_dc_refine(sw, blocks, list(range(ncomp)), n_by, n_bx, al)
        return _sos(all_comps, 0, 0, al + 1, al) + sw.finish()

    def ac_first(ci: int, ss: int, se: int, al: int) -> bytes:
        sw = _ScanWriter(restart_interval)
        _encode_ac_first(sw, blocks[ci], ss, se, al)
        return _sos([(ci + 1, 0, 0)], ss, se, 0, al) + sw.finish()

    def ac_refine(ci: int, ss: int, se: int, al: int) -> bytes:
        sw = _ScanWriter(restart_interval)
        _encode_ac_refine(sw, blocks[ci], ss, se, al)
        return _sos([(ci + 1, 0, 0)], ss, se, al + 1, al) + sw.finish()

    out += dc_first(1)
    if color:
        out += ac_first(0, 1, 5, 2)
        out += ac_first(0, 6, 63, 2)
        out += ac_first(1, 1, 63, 1)
        out += ac_first(2, 1, 63, 1)
        out += dc_refine(0)
        out += ac_refine(0, 1, 63, 1)
        out += ac_refine(0, 1, 63, 0)
        out += ac_refine(1, 1, 63, 0)
        out += ac_refine(2, 1, 63, 0)
    else:
        out += ac_first(0, 1, 63, 1)
        out += dc_refine(0)
        out += ac_refine(0, 1, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_bits(br: _BitReader, n: int) -> int:
    v = 0
    for _ in range(n):
        v = (v << 1) | br.read_bit()
    return v


class _RestartTracker:
    """Per-scan restart bookkeeping (T.81 E.2.4 applied to progressive
    scans): every ``dri`` MCUs, byte-align + consume RSTn, check the
    modulo-8 sequence, and tell the caller to reset predictor/EOB-run
    state.  dri=0 disarms it."""

    def __init__(self, dri: int) -> None:
        self.dri = dri
        self.mcu = 0
        self.rst_seq = 0

    def boundary(self, br: _BitReader) -> bool:
        """Call before each MCU; True iff a restart was consumed."""
        hit = bool(self.dri) and self.mcu > 0 and self.mcu % self.dri == 0
        if hit:
            n = br.align_restart()
            if n != self.rst_seq:
                raise ValueError(
                    f"restart marker out of sequence: RST{n}, "
                    f"expected RST{self.rst_seq}"
                )
            self.rst_seq = (self.rst_seq + 1) & 7
        self.mcu += 1
        return hit


def _decode_dc_scan(
    br: _BitReader,
    coef: list[np.ndarray],
    scan_comps: list[int],
    dc_maps: dict[int, dict],
    td_of: dict[int, int],
    n_by: int,
    n_bx: int,
    ah: int,
    al: int,
    dri: int = 0,
) -> None:
    preds = {ci: 0 for ci in scan_comps}
    rst = _RestartTracker(dri)
    for by in range(n_by):
        for bx in range(n_bx):
            if rst.boundary(br):
                preds = {ci: 0 for ci in scan_comps}
            for ci in scan_comps:
                if ah == 0:
                    s = br.read_huff(dc_maps[td_of[ci]])
                    preds[ci] += br.receive_extend(s)
                    coef[ci][by, bx, 0] = preds[ci] << al
                else:
                    if br.read_bit():
                        coef[ci][by, bx, 0] |= 1 << al


def _decode_ac_first_scan(
    br: _BitReader, comp: np.ndarray, ac_map: dict,
    ss: int, se: int, al: int, dri: int = 0,
) -> None:
    n_by, n_bx = comp.shape[:2]
    eobrun = 0
    rst = _RestartTracker(dri)
    for by in range(n_by):
        for bx in range(n_bx):
            if rst.boundary(br):
                eobrun = 0  # an EOB run may not cross a restart
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = br.read_huff(ac_map)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += _read_bits(br, r)
                    break
                k += r
                if k > se:
                    raise ValueError("progressive AC run past band end")
                comp[by, bx, k] = br.receive_extend(s) << al
                k += 1


def _decode_ac_refine_scan(
    br: _BitReader, comp: np.ndarray, ac_map: dict,
    ss: int, se: int, al: int, dri: int = 0,
) -> None:
    n_by, n_bx = comp.shape[:2]
    p1, m1 = 1 << al, -1 << al
    eobrun = 0
    rst = _RestartTracker(dri)

    def correct(zz: np.ndarray, k: int, stop: int) -> None:
        """Apply correction bits to every nonzero-history coefficient
        in k..stop (the post-EOB sweep)."""
        for j in range(k, stop + 1):
            c = int(zz[j])
            if c != 0 and br.read_bit() and not (c & p1):
                zz[j] = c + (p1 if c >= 0 else m1)

    for by in range(n_by):
        for bx in range(n_bx):
            if rst.boundary(br):
                eobrun = 0  # an EOB run may not cross a restart
            zz = comp[by, bx]
            if eobrun > 0:
                correct(zz, ss, se)
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = br.read_huff(ac_map)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s:
                    if s != 1:
                        raise ValueError(
                            "progressive AC refinement size must be 1"
                        )
                    newval = p1 if br.read_bit() else m1
                else:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += _read_bits(br, r)
                        break
                    r = 15  # ZRL: skip 16 zero-history (15 decrements
                    # + landing on the 16th, consumed by k += 1 below)
                # advance over r zero-history coefficients, applying
                # correction bits to history coefficients passed
                while k <= se:
                    c = int(zz[k])
                    if c != 0:
                        if br.read_bit() and not (c & p1):
                            zz[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    zz[k] = newval
                k += 1
            if eobrun > 0:
                correct(zz, k, se)
                eobrun -= 1


def decode_jpeg_progressive(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, RGB-or-gray bytes) for a progressive (SOF2)
    4:4:4 Huffman JPEG, including restart intervals (DRI + RST0..7 in
    every scan — r12; the baseline decoder got them in r11).
    Subsampling and 12-bit still raise — the quarantine route."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    i = 2
    dri = 0  # restart interval in MCUs; 0 = none
    qts: dict[int, np.ndarray] = {}
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    w = h = None
    comps: list[tuple[int, int, int]] = []
    coef: list[np.ndarray] = []
    cid_index: dict[int, int] = {}
    n_by = n_bx = 0
    while i + 2 <= len(payload):
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
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            for c in range(nc):
                cid, samp, tq = struct.unpack_from("BBB", seg, 6 + 3 * c)
                if samp != 0x11:
                    raise NotImplementedError(
                        "subsampled chroma (not 4:4:4)"
                    )
                cid_index[cid] = len(comps)
                comps.append((cid, samp, tq))
            n_bx, n_by = (w + 7) // 8, (h + 7) // 8
            coef = [
                np.zeros((n_by, n_bx, 64), dtype=np.int64)
                for _ in range(nc)
            ]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "decode_jpeg_progressive is for SOF2 streams only"
            )
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nv])
                (dc_maps if tc == 0 else ac_maps)[th] = _huff_decode_map(
                    bits, vals
                )
                j += 17 + nv
        elif marker == 0xDD:
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:
            if w is None:
                raise ValueError("SOS before SOF2")
            ns = seg[0]
            scan: list[tuple[int, int, int]] = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cid, tt >> 4, tt & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            # entropy data: up to the next real marker (stuffed 0xFF00
            # bytes AND RST0..7 restart markers belong to the scan)
            dstart = i + 2 + seg_len
            j = dstart
            while j + 1 < len(payload):
                if payload[j] == 0xFF and payload[j + 1] != 0x00 and not (
                    0xD0 <= payload[j + 1] <= 0xD7
                ):
                    break
                j += 1
            br = _BitReader(payload[dstart:j])
            if ss == 0:
                if se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                _decode_dc_scan(
                    br, coef, [cid_index[cid] for cid, _t, _a in scan],
                    dc_maps, {cid_index[cid]: td for cid, td, _a in scan},
                    n_by, n_bx, ah, al, dri=dri,
                )
            else:
                if ns != 1:
                    raise ValueError(
                        "progressive AC scans are single-component"
                    )
                cid, _td, ta = scan[0]
                if ah == 0:
                    _decode_ac_first_scan(
                        br, coef[cid_index[cid]], ac_maps[ta], ss, se, al,
                        dri=dri,
                    )
                else:
                    _decode_ac_refine_scan(
                        br, coef[cid_index[cid]], ac_maps[ta], ss, se, al,
                        dri=dri,
                    )
            i = j
            continue
        i += 2 + seg_len
    if w is None or not coef:
        raise ValueError("JPEG missing SOF2/SOS")
    # shared reconstruction: dequant + IDCT + color transform
    planes = []
    for ci, (cid, _s, tq) in enumerate(comps):
        qz = qts[tq][_ZZ_ROWS, _ZZ_COLS]
        deq = coef[ci].astype(np.float64) * qz
        mats = np.zeros((n_by, n_bx, 8, 8))
        mats[:, :, _ZZ_ROWS, _ZZ_COLS] = deq
        blocks = np.einsum("ji,abjk,kl->abil", _C, mats, _C) + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(n_by * 8, n_bx * 8)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, out.tobytes()
    if len(planes) != 3:
        raise NotImplementedError(f"JPEG with {len(planes)} components")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()

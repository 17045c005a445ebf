"""Wave 52: PDF structure audit — page counts and version mix without
a PDF library.

After images, PDFs are the next-largest opaque-binary class in a real
crawl, and the triage questions are the same shape as the image
container audits (webp_dims/tiff_dims/exif): how many assets, how many
PAGES (the unit OCR/extraction capacity is provisioned in), which
format versions, how many encrypted (→ skip before wasting decode
budget).  All of that lives in the cross-reference skeleton — header
version comment, trailer ``/Root`` catalog, the ``/Pages`` tree whose
root ``/Count`` is the spec-authoritative total page count (ISO 32000
§7.7.3.2: a node's Count is the number of LEAF pages below it, so the
root's Count is the document total even in a multi-level tree) — none
of it in content streams, so no decompression and no codec.

The parser here is the honest header-audit half only: classic
(non-compressed) xref documents with the catalog/pages objects in
plain object syntax.  Cross-reference STREAMS (PDF 1.5+ compressed
xref) and encrypted documents are REASONED quarantine/flag paths, not
silent zeros — the webp/tiff capability-gate pattern.

Reference scope: §2B north-star (multimodal/opaque columns) — the
reference client has no binary-asset path; semantics from the public
ISO 32000 spec.
"""

from __future__ import annotations

import re

_HEADER_RE = re.compile(rb"^%PDF-(\d+\.\d+)")
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+(\d+)\s+R\b")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+(\d+)\s+R\b")
_COUNT_RE = re.compile(rb"/Count\s+(\d+)\b")
_TYPE_PAGES_RE = re.compile(rb"/Type\s*/Pages\b")


def encode_pdf(
    n_pages: int,
    version: str = "1.4",
    two_level: bool = False,
    encrypted: bool = False,
) -> bytes:
    """A minimal spec-shaped PDF skeleton: header, catalog, pages tree
    (optionally two-level — root + one intermediate node per half, the
    shape that catches parsers who count leaf ``/Type /Page`` objects
    instead of trusting the root ``/Count``), leaf page objects, xref
    table, trailer.  `encrypted` plants an ``/Encrypt`` entry in the
    trailer (flag-only; no actual crypto — the audit never reads
    content streams anyway)."""
    if n_pages < 1:
        raise ValueError("PDFs have ≥1 page")
    objects: list[bytes] = []  # object number = index + 1

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    cat_num = add(b"")  # patched after pages root exists
    if two_level and n_pages >= 2:
        half = n_pages // 2
        kid_nums = []
        leaf_start = 4  # catalog=1, root=2, kids=3..4, leaves after
        root_num = add(b"")
        k1 = add(b"")
        k2 = add(b"")
        leaves_a = [
            add(b"<< /Type /Page /Parent %d 0 R >>" % k1)
            for _ in range(half)
        ]
        leaves_b = [
            add(b"<< /Type /Page /Parent %d 0 R >>" % k2)
            for _ in range(n_pages - half)
        ]
        objects[k1 - 1] = (
            b"<< /Type /Pages /Parent %d 0 R /Count %d /Kids [%s] >>"
            % (root_num, half,
               b" ".join(b"%d 0 R" % n for n in leaves_a))
        )
        objects[k2 - 1] = (
            b"<< /Type /Pages /Parent %d 0 R /Count %d /Kids [%s] >>"
            % (root_num, n_pages - half,
               b" ".join(b"%d 0 R" % n for n in leaves_b))
        )
        objects[root_num - 1] = (
            b"<< /Type /Pages /Count %d /Kids [%d 0 R %d 0 R] >>"
            % (n_pages, k1, k2)
        )
        del kid_nums, leaf_start
    else:
        root_num = add(b"")
        leaves = [
            add(b"<< /Type /Page /Parent %d 0 R >>" % root_num)
            for _ in range(n_pages)
        ]
        objects[root_num - 1] = (
            b"<< /Type /Pages /Count %d /Kids [%s] >>"
            % (n_pages, b" ".join(b"%d 0 R" % n for n in leaves))
        )
    objects[cat_num - 1] = b"<< /Type /Catalog /Pages %d 0 R >>" % root_num

    out = bytearray(b"%%PDF-%s\n" % version.encode())
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_off = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root %d 0 R" % (len(objects) + 1, cat_num)
    if encrypted:
        out += b" /Encrypt 99 0 R"
    out += b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def pdf_audit(payload: bytes) -> tuple[str, int, bool]:
    """(version, n_pages, encrypted) from the structural skeleton.

    Walks every ``N G obj … endobj`` span, resolves the trailer's
    ``/Root`` catalog → its ``/Pages`` reference → that object's
    ``/Count`` (the spec-authoritative total).  Raises ValueError on
    non-PDF bytes, a missing/ill-formed catalog chain, or a document
    whose page tree is only reachable through a compressed
    cross-reference STREAM (no plain catalog object anywhere) — the
    quarantine signals."""
    m = _HEADER_RE.match(payload)
    if not m:
        raise ValueError("not a PDF (missing %PDF- header)")
    version = m.group(1).decode()
    encrypted = b"/Encrypt" in payload
    objs: dict[int, bytes] = {}
    for om in _OBJ_RE.finditer(payload):
        objs[int(om.group(1))] = om.group(3)
    root_m = _ROOT_RE.search(payload)
    catalog = None
    if root_m:
        catalog = objs.get(int(root_m.group(1)))
    if catalog is None:
        # fall back: any catalog-typed object (trailer may live in a
        # compressed xref stream we don't decode)
        for body in objs.values():
            if b"/Type" in body and b"/Catalog" in body:
                catalog = body
                break
    if catalog is None:
        raise ValueError(
            "no reachable /Root catalog (compressed-xref-only PDFs "
            "quarantine — the documented capability seam)"
        )
    pages_m = _PAGES_REF_RE.search(catalog)
    if not pages_m:
        raise ValueError("catalog has no /Pages reference")
    pages = objs.get(int(pages_m.group(1)))
    if pages is None or not _TYPE_PAGES_RE.search(pages):
        raise ValueError("/Pages reference does not resolve to a Pages node")
    count_m = _COUNT_RE.search(pages)
    if not count_m:
        raise ValueError("Pages root has no /Count")
    return version, int(count_m.group(1)), encrypted

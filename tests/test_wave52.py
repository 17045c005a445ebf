"""Wave 52: PDF structure audit + gzip JSONL ingest."""

from __future__ import annotations

import gzip
import glob

import pytest
from pyspark.sql import functions as F

from vector_ai_npm_spark.multimodal.pdf import encode_pdf, pdf_audit


@pytest.mark.parametrize("two_level", [False, True])
@pytest.mark.parametrize("n_pages", [1, 2, 9, 40])
def test_pdf_roundtrip(two_level, n_pages):
    for version in ("1.4", "1.7", "2.0"):
        payload = encode_pdf(n_pages, version, two_level=two_level)
        assert pdf_audit(payload) == (version, n_pages, False)


def test_pdf_two_level_root_count_is_authoritative():
    """A parser counting leaf /Type /Page objects would still pass the
    flat fixtures; prove the audit reads the ROOT /Count by corrupting
    a kid node's Count — the total must not change."""
    payload = bytearray(encode_pdf(10, "1.5", two_level=True))
    # kid counts are 5 and 5; garble the first kid's Count to 1
    idx = payload.index(b"/Count 5")
    payload[idx:idx + 8] = b"/Count 1"
    assert pdf_audit(bytes(payload))[1] == 10


def test_pdf_encrypted_flag_and_quarantine_paths():
    assert pdf_audit(encode_pdf(3, "1.6", encrypted=True)) == ("1.6", 3, True)
    with pytest.raises(ValueError, match="missing %PDF"):
        pdf_audit(b"PK\x03\x04 zipfile")
    with pytest.raises(ValueError, match="quarantine"):
        pdf_audit(b"%PDF-1.5\nno objects here\n%%EOF")
    # catalog present but the /Pages ref dangles
    broken = b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 9 0 R >>\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF"
    with pytest.raises(ValueError, match="Pages"):
        pdf_audit(broken)


def test_pdf_encoder_validates():
    with pytest.raises(ValueError):
        encode_pdf(0)


def test_gzip_jsonl_parts_really_gzip_and_readable(spark, tmp_path):
    """The scan face's fixture contract: part files are genuine gzip
    members (magic 1f 8b, decompressible by stdlib) and Spark's text
    reader wrote one line per row."""
    path = str(tmp_path / "gz")
    df = spark.range(100).select(
        F.to_json(F.struct(F.col("id"))).alias("line")
    )
    df.repartition(4).write.option("compression", "gzip").text(path)
    files = sorted(glob.glob(path + "/part-*.gz"))
    assert len(files) == 4
    lines = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            lines.extend(ln.strip() for ln in fh if ln.strip())
    assert len(lines) == 100
    back = spark.read.json(path)
    assert back.count() == 100
    assert back.agg(F.sum("id")).first()[0] == 4950

"""Wave-26: decode quarantine — the poison-asset contract."""

from __future__ import annotations

import pytest

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


def test_quarantine_counts_match_corruption_rule(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    expected = {"ok": 0, "unrecognized": 0, "decode_error": 0}
    sw = sh = 0
    for d in ids:
        if d % 20 == 0:
            expected["unrecognized"] += 1
        elif d % 20 == 10:
            expected["decode_error"] += 1
        else:
            expected["ok"] += 1
            sw += 4 + d % 5
            sh += 5 + d % 3
    got = {
        r.status: r
        for r in registry.run(
            "multimodal_decode_quarantine", spark, sf_oracle
        ).collect()
    }
    assert {s: r.n_assets for s, r in got.items()} == expected
    assert (got["ok"].sum_width, got["ok"].sum_height) == (sw, sh)
    assert got["unrecognized"].sum_width == 0
    assert got["decode_error"].sum_width == 0
    # non-vacuous: every status bucket is exercised by the fixture
    assert all(v > 0 for v in expected.values())


def test_corruptions_actually_fail_decode():
    """Unit-level: the two corruption classes raise the two distinct
    exception families the classifier maps to statuses — a decoder
    that silently accepts corrupt bytes would break this first."""
    from vector_ai_npm_spark.multimodal.binary import (
        decode_pixels,
        encode_png,
    )

    png = encode_png(5, 6, bytes(range(90)))
    assert decode_pixels(png)[:2] == (5, 6)
    bad_magic = png[:2] + bytes([png[2] ^ 0xFF]) + png[3:]
    with pytest.raises(NotImplementedError):
        decode_pixels(bad_magic)
    truncated = png[: len(png) // 2]
    with pytest.raises(Exception) as ei:
        decode_pixels(truncated)
    assert not isinstance(ei.value, NotImplementedError)

"""Wave 50: filtered ANN (predicate-widened IVF probe) + EXIF
orientation parsing.

The filtered join's driver contract (validity / fill / full-probe
identity / widened floor) lives in `ivf_filtered_recall_contract`;
these tests pin the pieces the contract can't see from booleans:
the widening arithmetic itself, and the EXIF byte-level parser
(endianness, marker skipping, defaults, quarantine signals).
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.multimodal.exif import (
    _EXIF_MAGIC,
    display_dims,
    encode_jpeg_with_exif,
    exif_orientation,
)

SF = "/root/testdata/sf0.001"


# ----------------------------------------------------------------- EXIF


@pytest.mark.parametrize("little", [True, False])
@pytest.mark.parametrize("orientation", list(range(1, 9)))
def test_exif_roundtrip_all_orientations(little, orientation):
    jpeg = encode_jpeg_with_exif(640, 480, orientation, little=little)
    po, pw, ph, endian = exif_orientation(jpeg)
    assert (po, pw, ph) == (orientation, 640, 480)
    assert endian == ("little" if little else "big")


def test_exif_display_dims_transpose():
    for o in range(1, 5):
        assert display_dims(64, 48, o) == (64, 48)
    for o in range(5, 9):
        assert display_dims(64, 48, o) == (48, 64)


def test_exif_skips_leading_app0_and_respects_no_app0():
    for pad in (True, False):
        jpeg = encode_jpeg_with_exif(10, 20, 6, pad_app0=pad)
        assert exif_orientation(jpeg)[:3] == (6, 10, 20)


def test_exif_orientation_defaults_to_1_when_tag_absent():
    """An Exif blob with dims but NO 0x0112 tag → spec default 1."""
    endian = "<"
    tiff = bytearray(b"II*\x00") + struct.pack(endian + "I", 8)
    entries = [
        (0x0100, 4, struct.pack(endian + "I", 33)),
        (0x0101, 3, struct.pack(endian + "H", 44) + b"\x00\x00"),
    ]
    tiff += struct.pack(endian + "H", len(entries))
    for tag, typ, value in entries:
        tiff += struct.pack(endian + "HHI", tag, typ, 1) + value
    tiff += struct.pack(endian + "I", 0)
    body = _EXIF_MAGIC + bytes(tiff)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body
        + b"\xff\xd9"
    )
    assert exif_orientation(jpeg) == (1, 33, 44, "little")


def test_exif_quarantine_signals():
    with pytest.raises(ValueError, match="SOI"):
        exif_orientation(b"\x00\x01")
    # JPEG with no APP1 at all
    with pytest.raises(ValueError, match="no Exif"):
        exif_orientation(b"\xff\xd8\xff\xd9")
    # APP1 present but not an Exif body
    body = b"http://ns.adobe.com/xap/1.0/\x00"
    xmp = b"\xff\xd8\xff\xe1" + struct.pack(">H", 2 + len(body)) + body + b"\xff\xd9"
    with pytest.raises(ValueError, match="no Exif"):
        exif_orientation(xmp)
    # out-of-range orientation value
    jpeg = bytearray(encode_jpeg_with_exif(8, 8, 8, little=True))
    idx = jpeg.rindex(struct.pack("<H", 8) + b"\x00\x00")
    jpeg[idx:idx + 2] = struct.pack("<H", 9)
    with pytest.raises(ValueError, match="outside 1..8"):
        exif_orientation(bytes(jpeg))


def test_exif_encoder_validates():
    with pytest.raises(ValueError, match="1..8"):
        encode_jpeg_with_exif(8, 8, 0)
    with pytest.raises(ValueError, match="range"):
        encode_jpeg_with_exif(8, 1 << 16, 1)


# --------------------------------------------------------- filtered ANN


def test_filtered_widening_arithmetic():
    """eff_nprobe = min(nlist, ceil(nprobe / sel)), never below nprobe
    — checked through the internal formula inputs."""
    import math

    for n, n_pass, nprobe, nlist, want in (
        (500, 151, 4, 16, 14),   # the fixture shape: ceil(4/0.302)
        (500, 151, 2, 16, 7),
        (500, 500, 4, 16, 4),    # sel=1 → unchanged
        (500, 5, 4, 16, 16),     # rare predicate → full scan
        (500, 0, 4, 16, 16),     # degenerate: sel clamps to 1/n
    ):
        sel = max(n_pass / n, 1.0 / n)
        eff = int(min(nlist, max(nprobe, math.ceil(nprobe / sel))))
        assert eff == want, (n_pass, nprobe, eff, want)


def test_filtered_join_validity_fill_and_full_probe_identity(spark):
    """On the smoke fixture: every hit passes the predicate, k fills,
    and nprobe=nlist equals exact brute force over the filtered store
    (position-for-position on (q, vec_id))."""
    from vector_ai_npm_spark.retrieval.ivf import ivf_similarity_join_filtered
    from vector_ai_npm_spark.retrieval.search import similarity_join

    emb = load_table(spark, SF, "embeddings")
    pred = F.col("label") % 3 == 1
    queries = emb.where(F.col("vec_id").isin(0, 7, 13)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    got = ivf_similarity_join_filtered(
        queries, emb, pred, k=5, nlist=8, nprobe=8
    )
    rows = got.join(emb.select("vec_id", "label"), "vec_id").collect()
    assert len(rows) == 15  # 3 queries × k, filled
    assert all(r.label % 3 == 1 for r in rows)
    exact = similarity_join(queries, emb.where(pred), k=5, threshold=0.0)
    want = {(r.q_vec_id, r.rank): r.vec_id for r in exact.collect()}
    have = {(r.q_vec_id, r.rank): r.vec_id for r in got.collect()}
    assert have == want


def test_filtered_join_never_underfills_vs_postfilter(spark):
    """The shape post-filtering gets wrong: a rare predicate (one
    label of 10) must still return k rows per query because the
    filter applies INSIDE the probed cells and the probe widens to
    every cell."""
    from vector_ai_npm_spark.retrieval.ivf import ivf_similarity_join_filtered

    emb = load_table(spark, SF, "embeddings")
    pred = F.col("label") == 3
    n_pass = emb.where(pred).count()
    assert n_pass >= 5  # fixture sanity
    queries = emb.where(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    got = ivf_similarity_join_filtered(
        queries, emb, pred, k=5, nlist=8, nprobe=2
    )
    counts = {r.q_vec_id: r.n for r in got.groupBy("q_vec_id")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {0: 5, 7: 5}


def test_filtered_join_precomputed_selectivity_skips_store_scan(spark):
    """r10 advice: the measuring aggregate must NOT run when the
    caller supplies selectivity — at 100 TB a per-query full-store
    pass just to size nprobe would dominate the search.  Proven by
    making the measuring path impossible: the passed store is wrapped
    so .agg raises; results must still equal the auto-measured run."""
    from vector_ai_npm_spark.retrieval.ivf import ivf_similarity_join_filtered

    emb = load_table(spark, SF, "embeddings")
    pred = F.col("label") % 3 == 1
    n = emb.count()
    sel = emb.where(pred).count() / n
    queries = emb.where(F.col("vec_id").isin(0, 7, 13)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    auto = ivf_similarity_join_filtered(
        queries, emb, pred, k=5, nlist=8, nprobe=4
    )
    given = ivf_similarity_join_filtered(
        queries, emb, pred, k=5, nlist=8, nprobe=4, selectivity=sel
    )
    assert (
        sorted(map(tuple, auto.select("q_vec_id", "rank", "vec_id").collect()))
        == sorted(map(tuple, given.select("q_vec_id", "rank", "vec_id").collect()))
    )

    class _NoAggStore:
        """Delegates everything except .agg (which must not be hit)."""

        def __init__(self, df):
            self._df = df

        def agg(self, *a, **k):
            raise AssertionError(
                "measuring aggregate ran despite provided selectivity"
            )

        def __getattr__(self, name):
            return getattr(self._df, name)

    guarded = ivf_similarity_join_filtered(
        queries, _NoAggStore(emb), pred, k=5, nlist=8, nprobe=4,
        selectivity=sel,
    )
    assert guarded.count() == 15

"""Wave 46 (round 10): TIFF pixel decode — PackBits + TIFF-LZW on real
payload bytes, value-oracled (the round-9 verdict's item 2).

`multimodal_decode_tiff` — per document, the sha2-chain hex chars ARE
the grayscale pixels (one byte per char, w·h ≤ 100 of the 256-char
chain), written as a REAL multi-strip grayscale TIFF via
tiff.encode_tiff — compression cycling none/PackBits/LZW by doc_id%3,
byte order alternating little/big by doc_id%2, 3 rows per strip
(strip offset/count arrays stored out-of-line — the real scanner-TIFF
layout), horizontal-differencing predictor on the doc_id%6==2 LZW
subset — then decoded back through the shared decode_pixels route
(TIFF magic dispatch) and compared byte-for-byte against the chain
substring computed independently.

The oracle reconstructs the same pixel bytes in DuckDB (unicode()
over the sha2 hex chain — exact integer bytes) and re-derives the
mean pixel, so a PackBits run defect, an LZW width-change/KwKwK/clear
defect, a predictor cumsum slip, a strip-boundary misread, or an
endianness bug flips mean_pixel or roundtrip_ok and fails the hash.

Scale shape: encode+decode ride one Arrow-batched mapInPandas; the
derived input frame crosses ONE bounded RoundRobin exchange
(~100-500 B/row — scale_partitions, r13) so the CPU-bound codec rides
executor parallelism; corpus text never shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table, scale_partitions
from vector_ai_npm_spark.registry import query


@query(
    "multimodal_decode_tiff",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             6 + CAST(doc_id % 5 AS INTEGER) AS w,
             7 + CAST(doc_id % 4 AS INTEGER) AS h,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 'none' WHEN 1 THEN 'packbits' ELSE 'lzw'
             END AS compression,
             CASE WHEN doc_id % 2 = 0 THEN 'little' ELSE 'big' END
               AS byte_order,
             doc_id % 6 = 2 AS predicted,
             sha256(text) || sha256(text || 'a') || sha256(text || 'b')
               || sha256(text || 'c') AS chain
      FROM documents
    )
    SELECT doc_id AS asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           compression,
           byte_order,
           predicted,
           ROUND(list_aggregate(
                   list_transform(range(0, w * h), j ->
                     unicode(substr(chain, CAST(j AS INTEGER) + 1, 1))),
                   'avg'), 6) AS mean_pixel,
           TRUE AS roundtrip_ok
    FROM m
    """,
)
def multimodal_decode_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF decode face — see module docstring."""
    from vector_ai_npm_spark.multimodal.binary import decode_pixels
    from vector_ai_npm_spark.multimodal.tiff import encode_tiff

    docs = load_table(spark, sf_dir, "documents")
    w = (F.lit(6) + F.col("doc_id") % 5).cast("int")
    h = (F.lit(7) + F.col("doc_id") % 4).cast("int")
    compression = F.element_at(
        F.array(F.lit("none"), F.lit("packbits"), F.lit("lzw")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    chain = F.concat(
        F.sha2(F.col("text"), 256),
        F.sha2(F.concat(F.col("text"), F.lit("a")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("b")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("c")), 256),
    )
    src = docs.select(
        F.col("doc_id").alias("asset_id"),
        w.alias("w"),
        h.alias("h"),
        compression.alias("compression"),
        (F.col("doc_id") % 2 == 0).alias("little"),
        (F.col("doc_id") % 6 == 2).alias("predicted"),
        F.encode(F.substring(chain, F.lit(1), w * h), "utf-8").alias(
            "px_raw"
        ),
    )

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        comp_codes = {"none": 1, "packbits": 32773, "lzw": 5}
        for pdf in batches:
            rows = []
            for aid, ww, hh, comp, little, pred, raw in zip(
                pdf["asset_id"], pdf["w"], pdf["h"], pdf["compression"],
                pdf["little"], pdf["predicted"], pdf["px_raw"],
            ):
                px = bytes(raw)
                tif = encode_tiff(
                    int(ww), int(hh), px,
                    compression=comp_codes[comp],
                    little=bool(little),
                    rows_per_strip=3,
                    predictor=2 if bool(pred) else 1,
                )
                dw, dh, dec = decode_pixels(tif)
                rows.append(
                    (
                        int(aid), dw, dh, comp,
                        "little" if bool(little) else "big",
                        bool(pred),
                        sum(dec) / len(dec),
                        dec == px and (dw, dh) == (int(ww), int(hh)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "compression",
                    "byte_order", "predicted", "mean_pixel",
                    "roundtrip_ok",
                ],
            )

    # CPU-bound pure-Python codec below, bounded derived payload per row:
    # spread to executor parallelism so a byte-sized input split cannot
    # serialize the decode onto one core (see scale_partitions)
    src = scale_partitions(src, spark)
    out = src.mapInPandas(
        _roundtrip,
        schema="asset_id long, width long, height long, "
        "compression string, byte_order string, predicted boolean, "
        "mean_pixel double, roundtrip_ok boolean",
    )
    return out.select(
        "asset_id",
        "width",
        "height",
        "compression",
        "byte_order",
        "predicted",
        F.round("mean_pixel", 6).alias("mean_pixel"),
        "roundtrip_ok",
    )


@query(
    "multimodal_decode_tiff_jpeg",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             8 + CAST(doc_id % 6 AS INTEGER) AS w,
             9 + CAST(doc_id % 5 AS INTEGER) AS h
      FROM documents
    )
    SELECT doc_id AS asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           doc_id % 2 = 0 AS shared_tables,
           TRUE AS mae_ok,
           TRUE AS layouts_agree,
           TRUE AS lossy_not_identity
    FROM m
    """,
)
def multimodal_decode_tiff_jpeg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """New-style JPEG-in-TIFF decode face (r13: the verdict's codec
    seam #3 — the TIFF walker and baseline JPEG codec composed per
    TechNote 2).

    Per document the sha2-chain pixels are JPEG-compressed into a
    multi-strip Compression=7 TIFF in BOTH spec-legal layouts — shared
    tables in tag 347 with abbreviated strips (what libtiff writes) on
    even doc_ids, fully self-contained strips on odd — then decoded
    back through the magic-dispatch route.  Booleans pin the seam:

      * mae_ok — mean |decoded−original| ≤ 8 (q90 on noise pixels, the
        hostile case for DCT coding; measured ≈3);
      * layouts_agree — the tag-347 merge decodes BYTE-IDENTICAL to
        the self-contained encoding of the same pixels (table
        splitting is lossless plumbing, so any divergence is a merge
        defect);
      * lossy_not_identity — decode ≠ original (the face would pass
        vacuously if the strips silently carried raw pixels).

    Old-style Compression=6 stays a reasoned quarantine
    (tiff.py decode_tiff; TUNING r13).  Scale shape: one Arrow-batched
    mapInPandas fed through one bounded derived-payload exchange
    (scale_partitions); corpus text never shuffles."""
    from vector_ai_npm_spark.multimodal.binary import decode_pixels
    from vector_ai_npm_spark.multimodal.tiff import encode_tiff_jpeg

    docs = load_table(spark, sf_dir, "documents")
    w = (F.lit(8) + F.col("doc_id") % 6).cast("int")
    h = (F.lit(9) + F.col("doc_id") % 5).cast("int")
    chain = F.concat(
        F.sha2(F.col("text"), 256),
        F.sha2(F.concat(F.col("text"), F.lit("a")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("b")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("c")), 256),
    )
    src = docs.select(
        F.col("doc_id").alias("asset_id"),
        w.alias("w"),
        h.alias("h"),
        (F.col("doc_id") % 2 == 0).alias("shared_tables"),
        F.encode(F.substring(chain, F.lit(1), w * h), "utf-8").alias(
            "px_raw"
        ),
    )

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, ww, hh, shared, raw in zip(
                pdf["asset_id"], pdf["w"], pdf["h"],
                pdf["shared_tables"], pdf["px_raw"],
            ):
                px = bytes(raw)
                ww, hh = int(ww), int(hh)
                tif_shared = encode_tiff_jpeg(
                    ww, hh, px, rows_per_strip=4, use_jpeg_tables=True
                )
                tif_plain = encode_tiff_jpeg(
                    ww, hh, px, rows_per_strip=4, use_jpeg_tables=False
                )
                primary = tif_shared if bool(shared) else tif_plain
                dw, dh, dec = decode_pixels(primary)
                _w2, _h2, dec_other = decode_pixels(
                    tif_plain if bool(shared) else tif_shared
                )
                mae = sum(abs(a - b) for a, b in zip(dec, px)) / len(px)
                rows.append(
                    (
                        int(aid), dw, dh, bool(shared),
                        mae <= 8.0,
                        dec == dec_other,
                        dec != px,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "shared_tables",
                    "mae_ok", "layouts_agree", "lossy_not_identity",
                ],
            )

    # CPU-bound pure-Python codec below, bounded derived payload per row:
    # spread to executor parallelism so a byte-sized input split cannot
    # serialize the decode onto one core (see scale_partitions)
    src = scale_partitions(src, spark)
    return src.mapInPandas(
        _roundtrip,
        schema="asset_id long, width long, height long, "
        "shared_tables boolean, mae_ok boolean, layouts_agree boolean, "
        "lossy_not_identity boolean",
    )

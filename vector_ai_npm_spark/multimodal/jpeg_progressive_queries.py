"""Wave 47 (round 10): progressive JPEG decode face — the round-9
verdict's item 1 (SOF2 was the largest decodable class of real crawl
assets still quarantining; PIL is absent in this environment so the
capability gate could not save it).

`multimodal_decode_jpeg_progressive` — the same sha2-chain pixels as
the baseline JPEG face, encoded as a REAL progressive (SOF2) JFIF
stream (jpeg_progressive.encode_jpeg_progressive: 10-scan standard
script with spectral selection AND successive approximation, EOB runs,
AC refinement correction bits) and decoded back through the SHARED
decode_pixels route — the SOF2 marker now dispatches to the
progressive multi-scan decoder instead of raising.

Contract per asset (all booleans pinned TRUE by the oracle):

  * dims exact;
  * mae_ok — mean absolute error ≤ 12 vs the source pixels (the
    baseline face's bound; same quantization tables, so the lossy
    floor is identical);
  * matches_baseline — progressive decode is BIT-IDENTICAL to
    decoding the same pixels through the baseline (SOF0) path: both
    encoders quantize identically, so any defect in scan assembly
    (EOB-run fold, ZRL skip, refinement bit order, DC successive
    approximation) breaks byte equality, a far sharper signal than
    the MAE bound;
  * lossy_not_identity — guards against a decode that short-circuits
    to the input.

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
    "multimodal_decode_jpeg_progressive",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             8 + CAST(doc_id % 7 AS INTEGER) AS w,
             9 + CAST(doc_id % 5 AS INTEGER) AS h
      FROM documents
    )
    SELECT doc_id AS asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           TRUE AS mae_ok,
           TRUE AS matches_baseline,
           TRUE AS lossy_not_identity
    FROM m
    """,
)
def multimodal_decode_jpeg_progressive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Progressive JPEG decode face — see module docstring."""
    import numpy as np

    from vector_ai_npm_spark.multimodal.binary import decode_pixels
    from vector_ai_npm_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from vector_ai_npm_spark.multimodal.jpeg_progressive import (
        encode_jpeg_progressive,
    )

    docs = load_table(spark, sf_dir, "documents")
    w = (F.lit(8) + F.col("doc_id") % 7).cast("int")
    h = (F.lit(9) + F.col("doc_id") % 5).cast("int")
    chain = F.concat(
        F.sha2(F.col("text"), 256),
        F.sha2(F.concat(F.col("text"), F.lit("a")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("b")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("c")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("d")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("e")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("f")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("g")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("h")), 256),
    )  # 9 × 64 hex chars = 576 ≥ max w·h·3 = 546
    src = docs.select(
        F.col("doc_id").alias("asset_id"),
        w.alias("w"),
        h.alias("h"),
        F.encode(F.substring(chain, F.lit(1), w * h * 3), "utf-8").alias(
            "pixels"
        ),
    )

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, ww, hh, pix in zip(
                pdf["asset_id"], pdf["w"], pdf["h"], pdf["pixels"]
            ):
                ww, hh, pix = int(ww), int(hh), bytes(pix)
                # r12: plant restart intervals across the fixture —
                # doc_id % 4 ∈ {0 (no DRI), 1, 2, 3 MCUs}; the decode
                # must stay bit-identical to the baseline path either
                # way, so a broken RST realign/reset breaks the hash.
                pj = encode_jpeg_progressive(
                    ww, hh, pix, quality=92, restart_interval=int(aid) % 4
                )
                dw, dh, dec = decode_pixels(pj)
                base = decode_jpeg(encode_jpeg(ww, hh, pix, quality=92))[2]
                a = np.frombuffer(pix, dtype=np.uint8).astype(np.int64)
                b = np.frombuffer(dec, dtype=np.uint8).astype(np.int64)
                mae = float(np.abs(a - b).mean())
                rows.append(
                    (
                        int(aid), dw, dh,
                        (dw, dh) == (ww, hh) and mae <= 12.0,
                        dec == base,
                        dec != pix,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "mae_ok",
                    "matches_baseline", "lossy_not_identity",
                ],
            )

    # CPU-bound pure-Python codec below, bounded derived payload per row:
    # spread to executor parallelism so a byte-sized input split cannot
    # serialize the decode onto one core (see scale_partitions)
    src = scale_partitions(src, spark)
    return src.mapInPandas(
        _roundtrip,
        schema="asset_id long, width long, height long, "
        "mae_ok boolean, matches_baseline boolean, "
        "lossy_not_identity boolean",
    )

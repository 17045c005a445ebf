"""Wave 65: baseline-JPEG real-crawl variants — restart intervals
(DRI + RST0..7) and subsampled chroma (4:2:0 / 4:2:2 / 4:4:0), the two
most common baseline JPEG shapes in web crawls (r10 verdict item 3)
and previously the decoder's documented quarantine seams.

The codec work lives in multimodal/jpeg.py (round 11): the decoder
walks the general interleaved T.81 A.2.3 MCU geometry with
byte-realigned, sequence-checked restart markers and box-replicate
chroma upsampling; the encoder now EMITS those variants too
(box-averaged chroma, MCU-interleaved scan, RSTn every N MCUs with DC
predictor reset), so every variant is roundtrip-tested against planted
fixtures rather than only accepted.

`multimodal_decode_jpeg_variants` pins three contracts per asset:

  * `sub_ok` — each subsampled variant (4:2:0, 4:2:2, 4:4:0) of a
    smooth-gradient image decodes dims-exact with mean absolute pixel
    error <= 4 (measured ~1 on these ramps at q=92; chroma ramps are
    slow so box-average→box-replicate loss stays near the DCT floor —
    a geometry bug in either direction blows straight through 4).
  * `dri_exact` — the decoded pixels of a DRI-encoded stream are
    BYTE-IDENTICAL to the no-DRI encode of the same pixels, for 4:4:4
    at interval 2 and 4:2:0 at interval 1 (restart only realigns bits
    and resets predictors; any drift in the modulo-8 walk or predictor
    reset shows as inequality, not fuzz).
  * `chroma_const_exact` — a gray-RGB image (zero chroma everywhere)
    decodes byte-identically through 4:2:0 and 4:4:4: the luma tiles
    are the same 8x8 spatial blocks in both geometries and constant
    chroma is a fixed point of average/replicate, so this isolates the
    MCU walk from subsampling loss.

Scale shape: one Arrow-batched mapInPandas over documents, map-only —
no shuffle, no driver state; the per-asset codec cost is flat, exactly
the shape of a 100 TB crawl decode audit (multimodal/queries.py PNG
face precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table, scale_partitions
from vector_ai_npm_spark.registry import query


def _gradient_rgb(doc_id: int, w: int, h: int):
    """Deterministic smooth per-channel ramps (no clipping in range for
    the fixture dims, so the pixel law is pure integer arithmetic)."""
    import numpy as np

    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    r = (doc_id % 97) + 2 * x + 3 * y
    g = 230 - 2 * x - y - (doc_id % 53)
    b = 30 + x + 2 * y + (doc_id % 31)
    return (
        np.stack(np.broadcast_arrays(r, g, b), axis=-1)
        .astype(np.uint8)
        .tobytes()
    )


@query(
    "multimodal_decode_jpeg_variants",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(14 + doc_id % 12 AS BIGINT) AS width,
           CAST(14 + doc_id % 10 AS BIGINT) AS height,
           TRUE AS sub_ok,
           TRUE AS dri_exact,
           TRUE AS chroma_const_exact
    FROM documents
    """,
)
def multimodal_decode_jpeg_variants(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Restart-interval + chroma-subsampling JPEG contract — see module
    docstring.  Dims 14..25 x 14..23 give 2..4 x 2..3 MCUs at 4:4:4
    (so interval 2 emits real RSTn markers) and 1..2 x 1..2 MCUs at
    4:2:0 (interval 1 exercises the 16x16-MCU restart walk)."""
    from collections.abc import Iterator

    import pandas as pd

    # ~75 s of intrinsic pure-Python JPEG codec work per sf0.1 pass rides
    # this face; the input is 8 B/row of doc_id, so spreading it to
    # executor parallelism is free and unserializes the decode
    docs = scale_partitions(
        load_table(spark, sf_dir, "documents").select("doc_id"), spark
    )

    def _audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from vector_ai_npm_spark.multimodal.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        def mae(a: bytes, b: bytes) -> float:
            return float(
                np.abs(
                    np.frombuffer(a, np.uint8).astype(np.int64)
                    - np.frombuffer(b, np.uint8).astype(np.int64)
                ).mean()
            )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 14 + did % 12, 14 + did % 10
                pix = _gradient_rgb(did, w, h)

                sub_ok = True
                for sub in ((2, 2), (2, 1), (1, 2)):
                    dw, dh, dec = decode_jpeg(
                        encode_jpeg(w, h, pix, quality=92, subsampling=sub)
                    )
                    sub_ok = (
                        sub_ok
                        and (dw, dh) == (w, h)
                        and mae(pix, dec) <= 4.0
                    )

                ref444 = decode_jpeg(encode_jpeg(w, h, pix, quality=92))[2]
                ref420 = decode_jpeg(
                    encode_jpeg(w, h, pix, quality=92, subsampling=(2, 2))
                )[2]
                dri_exact = (
                    decode_jpeg(
                        encode_jpeg(
                            w, h, pix, quality=92, restart_interval=2
                        )
                    )[2]
                    == ref444
                    and decode_jpeg(
                        encode_jpeg(
                            w,
                            h,
                            pix,
                            quality=92,
                            subsampling=(2, 2),
                            restart_interval=1,
                        )
                    )[2]
                    == ref420
                )

                # gray RGB = zero chroma: 4:2:0 must equal 4:4:4 exactly
                luma = np.frombuffer(pix, np.uint8).reshape(h, w, 3)[..., 0]
                gray3 = (
                    np.repeat(luma[..., None], 3, axis=-1)
                    .astype(np.uint8)
                    .tobytes()
                )
                chroma_const_exact = (
                    decode_jpeg(
                        encode_jpeg(
                            w, h, gray3, quality=92, subsampling=(2, 2)
                        )
                    )[2]
                    == decode_jpeg(encode_jpeg(w, h, gray3, quality=92))[2]
                )

                rows.append(
                    (did, w, h, sub_ok, dri_exact, chroma_const_exact)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "sub_ok", "dri_exact",
                    "chroma_const_exact",
                ],
            )

    return docs.mapInPandas(
        _audit,
        schema="asset_id long, width long, height long, sub_ok boolean, "
        "dri_exact boolean, chroma_const_exact boolean",
    ).select(
        "asset_id", "width", "height", "sub_ok", "dri_exact",
        "chroma_const_exact",
    )

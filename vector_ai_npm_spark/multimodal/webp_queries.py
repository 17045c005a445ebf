"""Wave 32: WebP container audit — the metadata pass that needs no codec.

`multimodal_webp_dims` — per-variant asset counts and canvas totals
for a WebP corpus, computed by PARSING REAL CONTAINER BYTES in the
executors (synthesize spec-valid VP8/VP8L/VP8X containers from the
documents table, then round-trip them through `webp.webp_dims`).  This
is the pass a 100 TB crawl pipeline runs before provisioning decode
capacity: how many assets, which variants, what pixel volume — all
from fixed-offset header fields, map-only, no libwebp anywhere.

Pixel decode itself is capability-gated (webp.decode_webp_auto → PIL/
libwebp or a reasoned NotImplementedError the quarantine face
isolates); this face deliberately reports ONLY the pure-Python
metadata so its hash is stable whether or not the cluster has the
codec.

Scale shape: synthesis + parse is one Arrow-batched map over the
documents table (no shuffle until the ≤3-group variant aggregate);
payload bytes never leave the executor that made them.

Reference scope: §2B north-star (multimodal columns) — the reference
client has no image path; container semantics from the public WebP
spec (RIFF framing, VP8L 14-bit dims, VP8 start code, VP8X canvas).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table, scale_partitions
from vector_ai_npm_spark.registry import query

_VARIANTS = ("vp8", "vp8l", "vp8x")


@query(
    "multimodal_webp_dims",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INTEGER)
             WHEN 0 THEN 'vp8' WHEN 1 THEN 'vp8l' ELSE 'vp8x'
           END AS variant,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(1 + doc_id % 300) AS BIGINT) AS sum_width,
           CAST(SUM(1 + (doc_id * 7) % 200) AS BIGINT) AS sum_height,
           TRUE AS all_parsed
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_webp_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP corpus audit — see module docstring.  The oracle
    reconstructs (variant, w, h) from the deterministic synthesis
    formula; the Spark side gets them ONLY by building the container
    bytes and parsing them back, so a regression in either the RIFF
    chunk walk or any variant's dimension-field layout flips a sum →
    hash mismatch."""
    from vector_ai_npm_spark.multimodal.webp import (
        encode_webp_header,
        webp_dims,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def _audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows_out = []
        for pdf in batches:
            for did in pdf["doc_id"]:
                did = int(did)
                w = 1 + did % 300
                h = 1 + (did * 7) % 200
                variant = _VARIANTS[did % 3]
                payload = encode_webp_header(w, h, variant)
                pw, ph, pv = webp_dims(payload)
                rows_out.append(
                    (pv, pw, ph, (pw, ph, pv) == (w, h, variant))
                )
            yield pd.DataFrame(
                rows_out,
                columns=["variant", "width", "height", "ok"],
            )
            rows_out = []

    # Deliberately NOT spread to executor parallelism (r14 measured
    # counter-case): webp_dims parses a handful of fixed-offset header
    # fields per asset — the RoundRobin exchange cost more than the
    # freed compute (isolated 0.40 s -> 0.58 s, 0.86 -> 1.27x pin).
    parsed = docs.mapInPandas(
        _audit,
        schema="variant string, width long, height long, ok boolean",
    )
    return parsed.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum("width").cast("bigint").alias("sum_width"),
        F.sum("height").cast("bigint").alias("sum_height"),
        F.bool_and("ok").alias("all_parsed"),
    )


@query(
    "multimodal_decode_webp",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             4 + CAST(doc_id % 5 AS INTEGER) AS w,
             5 + CAST(doc_id % 3 AS INTEGER) AS h,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 4 WHEN 1 THEN 16 ELSE 64
             END AS n_colors,
             CAST(doc_id % 4 AS BIGINT) AS enc_path,
             sha256(text) || sha256(text || 'w') || sha256(text || 'x')
               || sha256(text || 'y') AS chain
      FROM documents
    )
    SELECT doc_id AS asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           enc_path,
           ROUND(list_aggregate(
                   list_transform(range(0, 3 * w * h), j ->
                     unicode(substr(chain,
                       3 * (unicode(substr(chain,
                              192 + CAST(j // 3 AS INTEGER) + 1, 1))
                            % n_colors)
                       + CAST(j % 3 AS INTEGER) + 1, 1))),
                   'avg'), 6) AS mean_pixel,
           TRUE AS roundtrip_ok
    FROM m
    """,
)
def multimodal_decode_webp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wave 49: VP8L (WebP lossless) PIXEL decode — closes the WebP
    half of the round-9 verdict's remaining codec seam (lossy VP8 stays
    honestly gated on libwebp).

    Per document the sha2-chain builds an n-color palette (n cycling
    4/16/64 — 2-bit-bundled / 4-bit-bundled / unbundled color-indexing
    widths) and a w×h index image, expanded to RGB and written as a
    REAL lossless WebP via webp.encode_webp_lossless, with the encoder
    path cycling by doc_id%4 so the corpus exercises every decoder
    stage: 0 = COLOR_INDEXING (palette + pixel bundling), 1 =
    SUBTRACT_GREEN + 4-bit color cache, 2 = PREDICTOR tiles + the
    max_symbol shortcut, 3 = CROSS-COLOR tiles + two-group meta prefix
    image + cache.  Decode goes back through the SHARED decode_pixels
    route (RIFF dispatch → vp8l.decode_vp8l_chunk) and is compared
    byte-for-byte against the palette expansion computed independently.

    The oracle reconstructs the same expansion in DuckDB (unicode()
    over the sha2 hex chain) and re-derives the mean pixel, so a prefix
    -code, LZ77-distance, cache, transform, or bundling defect flips
    mean_pixel or roundtrip_ok and fails the hash.

    Scale shape: encode+decode ride one Arrow-batched mapInPandas; the
    derived input frame crosses ONE bounded RoundRobin exchange
    (~250 B/row — scale_partitions, r13); corpus text never shuffles."""
    from vector_ai_npm_spark.multimodal.binary import decode_pixels
    from vector_ai_npm_spark.multimodal.webp import encode_webp_lossless

    docs = load_table(spark, sf_dir, "documents")
    w = (F.lit(4) + F.col("doc_id") % 5).cast("int")
    h = (F.lit(5) + F.col("doc_id") % 3).cast("int")
    n_colors = F.element_at(
        F.array(F.lit(4), F.lit(16), F.lit(64)),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    chain = F.concat(
        F.sha2(F.col("text"), 256),
        F.sha2(F.concat(F.col("text"), F.lit("w")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("x")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("y")), 256),
    )
    src = docs.select(
        F.col("doc_id").alias("asset_id"),
        w.alias("w"),
        h.alias("h"),
        n_colors.alias("n_colors"),
        (F.col("doc_id") % 4).alias("enc_path"),
        F.encode(
            F.substring(chain, F.lit(1), F.lit(3) * n_colors), "utf-8"
        ).alias("palette"),
        F.encode(F.substring(chain, F.lit(193), w * h), "utf-8").alias(
            "idx_raw"
        ),
    )
    # The codec below is CPU-bound per row, not byte-bound: a byte-sized
    # input split (one small parquet file here; a 128 MB blob split at
    # scale) serializes minutes of encode+decode onto one core.  Spread
    # to executor parallelism AFTER projecting away the corpus text —
    # the exchange carries ~250 B/row of derived palette+index bytes
    # (measured r13: 8.8 s single-core -> ~1 s across local[32]).
    src = scale_partitions(src, spark)

    _CONFIGS = (
        dict(palette=True),
        dict(subtract_green=True, cache_bits=4),
        dict(predictor_bits=2, use_max_symbol=True),
        dict(color_transform_bits=2, meta_bits=2, cache_bits=3),
    )

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, ww, hh, nc, path, pal, raw in zip(
                pdf["asset_id"], pdf["w"], pdf["h"], pdf["n_colors"],
                pdf["enc_path"], pdf["palette"], pdf["idx_raw"],
            ):
                pal, nc = bytes(pal), int(nc)
                idx = bytes(b % nc for b in bytes(raw))
                rgb = b"".join(pal[3 * i : 3 * i + 3] for i in idx)
                webp = encode_webp_lossless(
                    int(ww), int(hh), rgb, **_CONFIGS[int(path)]
                )
                dw, dh, dec = decode_pixels(webp)
                rows.append(
                    (
                        int(aid), dw, dh, int(path),
                        sum(dec) / len(dec),
                        dec == rgb and (dw, dh) == (int(ww), int(hh)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "enc_path",
                    "mean_pixel", "roundtrip_ok",
                ],
            )

    out = src.mapInPandas(
        _roundtrip,
        schema="asset_id long, width long, height long, enc_path long, "
        "mean_pixel double, roundtrip_ok boolean",
    )
    return out.select(
        "asset_id",
        "width",
        "height",
        "enc_path",
        F.round("mean_pixel", 6).alias("mean_pixel"),
        "roundtrip_ok",
    )

"""Wave 36: GIF decode — the LZW codec on real payload bytes,
value-oracled.

`multimodal_decode_gif` — per document, the sha2-chain bytes build a
power-of-two palette (first 3·n_colors chars) and an index image
(chars 193…192+w·h, mod n_colors), written as a REAL single-frame
GIF89a via gif.encode_gif — color-table size cycling 4/16/64 by
doc_id%3 (LZW min-code-size 2/4/6 on the line), interlacing on odd
doc_ids (4-pass row scatter) — then decoded back through the shared
decode_pixels route (GIF signature dispatch) and compared
byte-for-byte against the palette expansion computed independently.

The oracle reconstructs the same palette expansion in DuckDB
(unicode() over the sha2 hex chain — exact integer bytes) and
re-derives the mean pixel as an exact-int sum ÷ 3wh in double, so an
LZW width-growth, clear-code, KwKwK, sub-block, or interlace defect
flips mean_pixel or roundtrip_ok and fails the hash.

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
    "multimodal_decode_gif",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             4 + CAST(doc_id % 5 AS INTEGER) AS w,
             5 + CAST(doc_id % 3 AS INTEGER) AS h,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 4 WHEN 1 THEN 16 ELSE 64
             END AS n_colors,
             doc_id % 2 = 1 AS interlaced,
             sha256(text) || sha256(text || 'a') || sha256(text || 'b')
               || sha256(text || 'c') AS chain
      FROM documents
    )
    SELECT doc_id AS asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(n_colors AS BIGINT) AS n_colors,
           interlaced,
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
def multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF decode face — see module docstring."""
    from vector_ai_npm_spark.multimodal.binary import decode_pixels
    from vector_ai_npm_spark.multimodal.gif import encode_gif

    docs = load_table(spark, sf_dir, "documents")
    w = (F.lit(4) + F.col("doc_id") % 5).cast("int")
    h = (F.lit(5) + F.col("doc_id") % 3).cast("int")
    n_colors = F.element_at(
        F.array(F.lit(4), F.lit(16), F.lit(64)),
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
        n_colors.alias("n_colors"),
        (F.col("doc_id") % 2 == 1).alias("interlaced"),
        F.encode(
            F.substring(chain, F.lit(1), F.lit(3) * n_colors), "utf-8"
        ).alias("palette"),
        F.encode(F.substring(chain, F.lit(193), w * h), "utf-8").alias(
            "idx_raw"
        ),
    )

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, ww, hh, nc, il, pal, raw in zip(
                pdf["asset_id"], pdf["w"], pdf["h"], pdf["n_colors"],
                pdf["interlaced"], pdf["palette"], pdf["idx_raw"],
            ):
                pal, nc = bytes(pal), int(nc)
                idx = bytes(b % nc for b in bytes(raw))
                gif = encode_gif(
                    int(ww), int(hh), idx, pal,
                    interlace=bool(il),
                )
                dw, dh, dec = decode_pixels(gif)
                want = b"".join(pal[3 * i : 3 * i + 3] for i in idx)
                rows.append(
                    (
                        int(aid), dw, dh, nc, bool(il),
                        sum(dec) / len(dec),
                        dec == want and (dw, dh) == (int(ww), int(hh)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "n_colors",
                    "interlaced", "mean_pixel", "roundtrip_ok",
                ],
            )

    # CPU-bound pure-Python codec below, bounded derived payload per row:
    # spread to executor parallelism so a byte-sized input split cannot
    # serialize the decode onto one core (see scale_partitions)
    src = scale_partitions(src, spark)
    out = src.mapInPandas(
        _roundtrip,
        schema="asset_id long, width long, height long, n_colors long, "
        "interlaced boolean, mean_pixel double, roundtrip_ok boolean",
    )
    return out.select(
        "asset_id",
        "width",
        "height",
        "n_colors",
        "interlaced",
        F.round("mean_pixel", 6).alias("mean_pixel"),
        "roundtrip_ok",
    )

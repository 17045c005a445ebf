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

from vector_ai_npm_spark.io.sources import load_table
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

"""Wave 63: MP4 corpus audit — the video container member of the
no-codec audit family (multimodal/mp4.py)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_BRANDS = (b"isom", b"mp42", b"qt  ")


@query(
    "multimodal_mp4_dims",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42' ELSE 'qt  '
             END AS brand,
             CASE WHEN doc_id % 2 = 0 THEN 1000 ELSE 90000 END AS timescale,
             1000 + CAST((doc_id * 37) % 100000 AS BIGINT) AS duration,
             1 + CAST(doc_id % 3 AS INTEGER) AS n_tracks
      FROM documents
    )
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(n_tracks) AS BIGINT) AS total_tracks,
           CAST(SUM(duration * 1000 // timescale) AS BIGINT) AS total_millis,
           TRUE AS all_parsed
    FROM m GROUP BY brand
    """,
)
def multimodal_mp4_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4 audit: per-brand asset counts, track volume, and total
    MOVIE SECONDS (the transcode/frame-sample capacity unit) from real
    ISO-BMFF box bytes — mvhd v0 (even doc_ids, 1 kHz timescale) and
    v1 (odd, 90 kHz) both exercised, durations converted with exact
    integer floor-division so both engines sum integers."""
    from vector_ai_npm_spark.multimodal.mp4 import (
        encode_mp4_skeleton,
        mp4_audit,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def _audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                brand = _BRANDS[did % 3]
                timescale = 1000 if did % 2 == 0 else 90000
                duration = 1000 + (did * 37) % 100000
                n_tracks = 1 + did % 3
                payload = encode_mp4_skeleton(
                    brand, timescale, duration, n_tracks,
                    mvhd_v1=did % 2 == 1,
                )
                pb, pt, pdur, ptr = mp4_audit(payload)
                ok = (pb.encode("latin-1"), pt, pdur, ptr) == (
                    brand, timescale, duration, n_tracks
                )
                rows.append((pb, ptr, pdur * 1000 // pt, ok))
            yield pd.DataFrame(
                rows, columns=["brand", "tracks", "millis", "ok"]
            )

    # CPU-bound synth+parse over an 8 B/row doc_id frame: spread to
    # executor parallelism (r13 decode-face pattern, r14 audits)
    from vector_ai_npm_spark.io.sources import scale_partitions

    docs = scale_partitions(docs, spark)
    parsed = docs.mapInPandas(
        _audit,
        schema="brand string, tracks long, millis long, ok boolean",
    )
    return parsed.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum("tracks").cast("bigint").alias("total_tracks"),
        F.sum("millis").cast("bigint").alias("total_millis"),
        F.bool_and("ok").alias("all_parsed"),
    )

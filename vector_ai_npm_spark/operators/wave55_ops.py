"""Wave 55: Holt linear-trend forecast QA + APNG animation audit.

* `events_forecast_holt` — the trend member of the forecasting-QA
  family (naive → seasonal-naive MASE → SES level → THIS): Holt's
  two-parameter linear exponential smoothing at α=β=½ over daily
  counts, with the one-step-ahead forecast ŷ_t = l_{t−1} + b_{t−1}
  and its absolute error.  SES answers "is tomorrow near the level";
  Holt answers "is the LEVEL ITSELF drifting" — the distinction that
  separates a stationary event stream from one that is growing out
  from under its capacity plan.
* `multimodal_apng_frames` — the animated-PNG member of the container
  audit family: frame counts and loop policy from the acTL/fcTL
  control chunks (CRC-validated), the pre-decode pass that tells a
  training pipeline how many FRAMES (the decode-capacity unit, like
  PDF pages) an innocently ".png" corpus actually holds.

Cross-engine determinism for Holt (the SES lesson, extended to PAIRED
state): the recurrence carries (level, trend) together, so the fold
element type is a 2-element double list — DuckDB's list_reduce seeds
with the FIRST element, and building elements as [y, 0.0] makes that
seed exactly the textbook init l₁=y₁, b₁=0; the Spark mirror is a
NULL-initialized `aggregate` over the same prefix with the SAME
expression shapes (l' = ½y + ½(l+b); b' expanded to ¼y − ¼l + ¾b so
neither engine needs to reference l' twice), so both engines do the
identical IEEE-double operations in the identical order and every
(level, trend) is bit-exact.

Scale shape (both): corpus reduces to (type, day) counts in the first
aggregate; the O(days²) prefix folds run on the day-bounded frame.
The APNG audit is map-only Arrow batches; payloads never shuffle.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


@query(
    "events_forecast_holt",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), folded AS (
      SELECT event_type, day, c,
             list_reduce(
               list([CAST(c AS DOUBLE), CAST(0 AS DOUBLE)]) OVER (
                 PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               (acc, x) -> [
                 0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
                 0.25 * x[1] - 0.25 * acc[1] + 0.75 * acc[2]
               ]) AS lb
      FROM daily
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, c,
           lb[1] AS holt_level, lb[2] AS holt_trend,
           LAG(lb[1] + lb[2]) OVER w AS forecast,
           ABS(CAST(c AS DOUBLE) - LAG(lb[1] + lb[2]) OVER w) AS abs_err
    FROM folded
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def events_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt α=β=½ level+trend with one-step forecast error — see
    module docstring for the paired-state fold discipline."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w_prefix = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    folded = (
        daily.withColumn(
            "prefix",
            F.collect_list(
                F.array(F.col("c").cast("double"), F.lit(0.0))
            ).over(w_prefix),
        )
        .select(
            "event_type", "day", "c",
            F.expr(
                "aggregate(prefix, CAST(NULL AS ARRAY<DOUBLE>), (acc, x) -> "
                "IF(acc IS NULL, x, array("
                "0.5D * x[0] + 0.5D * (acc[0] + acc[1]), "
                "0.25D * x[0] - 0.25D * acc[0] + 0.75D * acc[1])))"
            ).alias("lb"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    forecast = F.lag(F.col("lb")[0] + F.col("lb")[1]).over(w)
    return folded.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "c",
        F.col("lb")[0].alias("holt_level"),
        F.col("lb")[1].alias("holt_trend"),
        forecast.alias("forecast"),
        F.abs(F.col("c").cast("double") - forecast).alias("abs_err"),
    )


# ------------------------------------------------------------------ APNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_apng_skeleton(
    w: int, h: int, n_frames: int, num_plays: int
) -> bytes:
    """Spec-shaped APNG control skeleton: IHDR, acTL, then per frame a
    CRC-valid fcTL (sequence-numbered, full-canvas, default blend/
    dispose) and a placeholder IDAT/fdAT.  Pixel payloads are empty —
    the audit reads control chunks only (the encode_webp_header
    pattern)."""
    if n_frames < 1:
        raise ValueError("APNG needs ≥1 frame")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    out = bytearray(_PNG_SIG + _chunk(b"IHDR", ihdr))
    out += _chunk(b"acTL", struct.pack(">II", n_frames, num_plays))
    seq = 0
    for i in range(n_frames):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, 1, 10, 0, 0
        )
        out += _chunk(b"fcTL", fctl)
        seq += 1
        if i == 0:
            out += _chunk(b"IDAT", b"")
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq))
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def apng_audit(payload: bytes) -> tuple[int, int, int, int, bool]:
    """(width, height, n_frames, num_plays, is_animated) from the
    control chunks.  A plain PNG (no acTL) reports 1 frame, plays 0,
    is_animated False.  CRC mismatches on control chunks and
    acTL/fcTL count disagreements raise ValueError — a corrupt
    animation control block means frame extraction would misbehave,
    so the asset quarantines."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i = 8
    width = height = None
    n_frames = None
    num_plays = 0
    fctl_count = 0
    while i + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[i : i + 4])
        typ = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + ln]
        if typ in (b"IHDR", b"acTL", b"fcTL"):
            (crc,) = struct.unpack(
                ">I", payload[i + 8 + ln : i + 12 + ln]
            )
            if crc != (zlib.crc32(typ + data) & 0xFFFFFFFF):
                raise ValueError(f"bad CRC on {typ.decode()} chunk")
        if typ == b"IHDR":
            width, height = struct.unpack(">II", data[:8])
        elif typ == b"acTL":
            n_frames, num_plays = struct.unpack(">II", data[:8])
        elif typ == b"fcTL":
            fctl_count += 1
        elif typ == b"IEND":
            break
        i += 12 + ln
    if width is None:
        raise ValueError("no IHDR chunk")
    if n_frames is None:
        return width, height, 1, 0, False
    if fctl_count != n_frames:
        raise ValueError(
            f"acTL declares {n_frames} frames but {fctl_count} fcTL "
            "chunks present"
        )
    return width, height, n_frames, num_plays, True


@query(
    "multimodal_apng_frames",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             8 + CAST(doc_id % 24 AS INTEGER) AS w,
             8 + CAST((doc_id * 5) % 21 AS INTEGER) AS h,
             CASE WHEN doc_id % 3 = 0
                  THEN 1 + CAST(doc_id % 6 AS INTEGER) ELSE 1 END AS frames,
             CASE WHEN doc_id % 3 = 0
                  THEN CAST(doc_id % 4 AS INTEGER) ELSE 0 END AS plays,
             doc_id % 3 = 0 AS animated
      FROM documents
    )
    SELECT animated AS is_animated,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(frames) AS BIGINT) AS total_frames,
           CAST(SUM(CASE WHEN plays = 0 AND animated THEN 1 ELSE 0 END)
                AS BIGINT) AS n_infinite_loops,
           CAST(SUM(w * h * frames) AS BIGINT) AS decode_pixels,
           TRUE AS all_parsed
    FROM m GROUP BY 1
    """,
)
def multimodal_apng_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APNG corpus audit — a third of the docs are animated (1-6 frames
    cycling, loop count 0-3 where 0 = infinite per spec), the rest are
    plain PNGs the audit must classify as 1-frame stills.  Every
    number comes from building real CRC-valid chunk bytes and parsing
    them back; decode_pixels = Σ w·h·frames is the capacity figure the
    audit exists to produce."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def _audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 8 + did % 24
                h = 8 + (did * 5) % 21
                animated = did % 3 == 0
                frames = 1 + did % 6 if animated else 1
                plays = did % 4 if animated else 0
                if animated:
                    payload = encode_apng_skeleton(w, h, frames, plays)
                else:
                    payload = (
                        _PNG_SIG
                        + _chunk(
                            b"IHDR",
                            struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0),
                        )
                        + _chunk(b"IDAT", b"")
                        + _chunk(b"IEND", b"")
                    )
                pw, ph, pf, pp, pa = apng_audit(payload)
                ok = (pw, ph, pf, pp, pa) == (w, h, frames, plays, animated)
                rows.append((pa, pf, pp == 0 and pa, pw * ph * pf, ok))
            yield pd.DataFrame(
                rows,
                columns=[
                    "is_animated", "frames", "infinite", "pixels", "ok",
                ],
            )

    # CPU-bound synth+parse over an 8 B/row doc_id frame: spread to
    # executor parallelism (r13 decode-face pattern, r14 audits)
    from vector_ai_npm_spark.io.sources import scale_partitions

    docs = scale_partitions(docs, spark)
    parsed = docs.mapInPandas(
        _audit,
        schema="is_animated boolean, frames long, infinite boolean, "
        "pixels long, ok boolean",
    )
    return parsed.groupBy("is_animated").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum("frames").cast("bigint").alias("total_frames"),
        F.sum(F.when(F.col("infinite"), 1).otherwise(0))
        .cast("bigint").alias("n_infinite_loops"),
        F.sum("pixels").cast("bigint").alias("decode_pixels"),
        F.bool_and("ok").alias("all_parsed"),
    )

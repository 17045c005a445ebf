"""Wave 58: grid-cell spatial radius join + WAV container audit.

* `join_geo_radius` — "which customers sit within R of which supplier
  sites": a point×point radius join with NO equi key, the 2D sibling
  of the interval-overlap shape (interval_ops.py) and the same
  classically dangerous naive plan (theta join → broadcast NLJ,
  O(n·m) distance checks).  The distributed shape is the standard
  grid-binning spatial join (what PostGIS/Sedona/geohash pipelines
  do):

    1. grid width G = R, so any within-R pair sits in the same or an
       ADJACENT cell;
    2. each PROBE point expands to its 3×3 neighbor cells (fan-out 9,
       constant — not data-squared; build points bin once);
    3. equi-join on cell id — a plain shuffled hash join AQE can
       size and skew-split — then the exact distance predicate as a
       post-filter.

  Per-cell cost is (points-per-cell)², a density × G² physical
  quantity, and output is radius-bound.  Coordinates derive from pure
  integer congruences (exact in both engines) and the distance is
  planar squared-degrees arithmetic — deliberately no haversine:
  sin/cos are libm-dependent and the OPERATOR under test is the
  binning join, not spherical trig (the nDCG exact-literals lesson;
  a production pipeline swaps in its geodesic of choice as the same
  post-filter).
* `multimodal_wav_dims` — the audio member of the container-audit
  family: channels / sample rate / bit depth / duration from real
  RIFF-WAVE fmt+data chunk bytes, no audio library (the webp_dims
  RIFF walk, reused shape).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_R = 3.0  # radius in planar degrees; grid width G = R
_R2 = _R * _R


def _lat(key):
    return -60.0 + (key * 7919 % 12000) / 100.0


def _lon(key):
    return -180.0 + (key * 104729 % 36000) / 100.0


@query(
    "join_geo_radius",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey AS cust,
             -60.0 + (c_custkey * 7919 % 12000) / 100.0 AS lat,
             -180.0 + (c_custkey * 104729 % 36000) / 100.0 AS lon
      FROM customer
    ), s AS (
      SELECT s_suppkey AS supp,
             -60.0 + (s_suppkey * 7919 % 12000) / 100.0 AS lat,
             -180.0 + (s_suppkey * 104729 % 36000) / 100.0 AS lon
      FROM supplier
    )
    SELECT c.cust, s.supp,
           (c.lat - s.lat) * (c.lat - s.lat)
             + (c.lon - s.lon) * (c.lon - s.lon) AS d2
    FROM c JOIN s
      ON (c.lat - s.lat) * (c.lat - s.lat)
           + (c.lon - s.lon) * (c.lon - s.lon) <= {_R2}
    """,
)
def join_geo_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-binned radius join — see module docstring.  The oracle
    states the raw theta join (DuckDB's optimizer copes at fixture
    scale); the Spark side must produce the identical pair set through
    the cell machinery, so a binning, neighbor-expansion, or dedup
    defect drops/duplicates a pair → hash red."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust"),
        (F.lit(-60.0) + (F.col("c_custkey") * 7919 % 12000) / 100.0)
        .alias("lat"),
        (F.lit(-180.0) + (F.col("c_custkey") * 104729 % 36000) / 100.0)
        .alias("lon"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supp"),
        (F.lit(-60.0) + (F.col("s_suppkey") * 7919 % 12000) / 100.0)
        .alias("lat"),
        (F.lit(-180.0) + (F.col("s_suppkey") * 104729 % 36000) / 100.0)
        .alias("lon"),
    )
    g = F.lit(_R)
    # build side bins once at its own cell
    s_binned = supp.select(
        "supp",
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
        F.floor(F.col("lat") / g).alias("cy"),
        F.floor(F.col("lon") / g).alias("cx"),
    )
    # probe side expands to the 3x3 neighborhood (fan-out 9, constant)
    offsets = F.array(*[F.lit(o) for o in (-1, 0, 1)])
    c_binned = (
        cust.withColumn("dy", F.explode(offsets))
        .withColumn("dx", F.explode(offsets))
        .select(
            "cust", "lat", "lon",
            (F.floor(F.col("lat") / g) + F.col("dy")).alias("cy"),
            (F.floor(F.col("lon") / g) + F.col("dx")).alias("cx"),
        )
    )
    d2 = (
        (F.col("lat") - F.col("s_lat")) * (F.col("lat") - F.col("s_lat"))
        + (F.col("lon") - F.col("s_lon")) * (F.col("lon") - F.col("s_lon"))
    )
    # a pair meets in exactly ONE cell (the build point's own), so the
    # 3x3 probe expansion cannot duplicate it — no distinct pass needed
    return (
        c_binned.join(s_binned, ["cy", "cx"])
        .where(d2 <= F.lit(_R2))
        .select("cust", "supp", d2.alias("d2"))
    )


# ------------------------------------------------------------------- WAV


def encode_wav_header(
    channels: int, sample_rate: int, bits: int, n_frames: int
) -> bytes:
    """Spec-valid RIFF-WAVE holding fmt + a data chunk of silence."""
    if channels < 1 or bits % 8 or n_frames < 0:
        raise ValueError("bad WAV parameters")
    block = channels * bits // 8
    data_len = n_frames * block
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block, block, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_len) + b"\x00" * data_len
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_dims(payload: bytes) -> tuple[int, int, int, int]:
    """(channels, sample_rate, bits, n_frames) from the fmt/data
    chunks; ValueError on non-WAV or truncated containers."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF-WAVE container")
    pos = 12
    fmt = None
    data_len = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"fmt ":
            fmt = payload[pos + 8 : pos + 8 + size]
            if len(fmt) < 16:
                raise ValueError("truncated fmt chunk")
        elif cid == b"data":
            data_len = size
        pos += 8 + size + (size & 1)
    if fmt is None or data_len is None:
        raise ValueError("missing fmt/data chunk")
    _, channels, rate, _, block, bits = struct.unpack("<HHIIHH", fmt[:16])
    if block != channels * bits // 8 or block == 0:
        raise ValueError("inconsistent block alignment")
    if data_len % block:
        raise ValueError("data chunk is not frame-aligned")
    return channels, rate, bits, data_len // block


@query(
    "multimodal_wav_dims",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             1 + CAST(doc_id % 2 AS INTEGER) AS channels,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100
             END AS rate,
             8 * (1 + CAST(doc_id % 2 AS INTEGER)) AS bits,
             100 + CAST(doc_id % 400 AS INTEGER) AS frames
      FROM documents
    )
    SELECT CAST(channels AS BIGINT) AS channels,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(frames) AS BIGINT) AS total_frames,
           CAST(SUM(frames * 1000000 // rate) AS BIGINT) AS total_micros,
           TRUE AS all_parsed
    FROM m GROUP BY 1, 2
    """,
)
def multimodal_wav_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV corpus audit — the pre-transcode capacity pass (how many
    channel-seconds at which rates).  Real RIFF bytes built and parsed
    back per doc; total_micros uses integer floor-division so both
    engines sum exact integers."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def _audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                ch = 1 + did % 2
                rate = (8000, 16000, 44100)[did % 3]
                bits = 8 * (1 + did % 2)
                frames = 100 + did % 400
                payload = encode_wav_header(ch, rate, bits, frames)
                pch, prate, pbits, pframes = wav_dims(payload)
                ok = (pch, prate, pbits, pframes) == (ch, rate, bits, frames)
                rows.append(
                    (pch, prate, pframes, pframes * 1_000_000 // prate, ok)
                )
            yield pd.DataFrame(
                rows,
                columns=["channels", "sample_rate", "frames", "micros", "ok"],
            )

    # CPU-bound synth+parse over an 8 B/row doc_id frame: spread to
    # executor parallelism (r13 decode-face pattern, r14 audits)
    from vector_ai_npm_spark.io.sources import scale_partitions

    docs = scale_partitions(docs, spark)
    parsed = docs.mapInPandas(
        _audit,
        schema="channels long, sample_rate long, frames long, "
        "micros long, ok boolean",
    )
    return parsed.groupBy("channels", "sample_rate").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum("frames").cast("bigint").alias("total_frames"),
        F.sum("micros").cast("bigint").alias("total_micros"),
        F.bool_and("ok").alias("all_parsed"),
    )

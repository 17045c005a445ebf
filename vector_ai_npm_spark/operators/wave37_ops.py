"""Wave 37: schema-drift audit, rank-biased overlap, TIFF dims audit.

* `dq_schema_drift` — the per-epoch STRUCTURAL data-quality readout
  next to the distribution-drift family (TVD/KS/chi-square): split the
  event stream into two md5 epochs (standing in for yesterday/today
  ingest batches) and compare the schema-health metrics a 100 TB
  pipeline alarms on — row count, JSON-field parse-failure count,
  event-type cardinality, user cardinality, value range in exact
  cents.  One corpus scan, two output rows; every metric an exact
  integer.
* `eval_rank_rbo` — Rank-Biased Overlap (Webber et al., TOIS 2010),
  truncated RBO@10 with p=0.9, between the full-precision cosine
  ranking and the 16-dim-prefix (matryoshka-style) ranking for one
  probe — THE standard top-weighted "how much did my cheap ranking
  disagree with the real one" metric, completing recall@k / MRR /
  nDCG / MAP / Kendall.  Per-depth overlaps |A_d ∩ B_d| come from
  max(rank_a, rank_b) prefix counts (pure integers); the p-powers are
  Python-computed constants embedded as EXACT decimal expansions in
  both engines (the nDCG idiom — in-engine POWER() is libm-dependent,
  and DuckDB's literal parse is not correctly rounded on shortest
  reprs); the depth fold runs in one fixed order.
* `multimodal_tiff_dims` — the TIFF member of the no-codec container
  audit family (WebP wave 32): per-doc spec-valid TIFF headers (both
  endiannesses, width as LONG, height as SHORT, filler tags to skip)
  synthesized and parsed back from REAL bytes in executors; dims +
  endianness mix oracle-pinned from the synthesis formula.  Pixel
  decode (LZW/PackBits/JPEG-in-TIFF) is the documented seam — the
  audit pass is what runs over a scanned-document archive before
  provisioning decode capacity.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import Decimal as _Dec

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.vectors import cosine_similarity, o_cosine
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.eval_metrics import (
    _duck_hash_mod,
    _spark_hash_mod,
)
from vector_ai_npm_spark.registry import query

# --------------------------------------------------------------------------
# dq_schema_drift
# --------------------------------------------------------------------------

_CENTS = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"


@query(
    "dq_schema_drift",
    oracle=f"""
    SELECT {_duck_hash_mod("event_id", "#ep", 2)} AS epoch,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (
             WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                   IS NULL) AS BIGINT) AS k_parse_fails,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN({_CENTS}) AS BIGINT) AS min_cents,
           CAST(MAX({_CENTS}) AS BIGINT) AS max_cents
    FROM events GROUP BY 1
    """,
)
def dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch schema-health audit — see module docstring."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy(
            _spark_hash_mod(F.col("event_id"), "#ep", 2).alias("epoch")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(k.isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("k_parse_fails"),
            F.count_distinct("event_type")
            .cast("bigint")
            .alias("n_event_types"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.min(F.expr(_CENTS)).cast("bigint").alias("min_cents"),
            F.max(F.expr(_CENTS)).cast("bigint").alias("max_cents"),
        )
    )


# --------------------------------------------------------------------------
# eval_rank_rbo
# --------------------------------------------------------------------------

_RBO_K = 10
_RBO_QID = 7
_PREFIX = 16
# p-powers folded left in Python, embedded as exact decimal expansions
# (a double's exact expansion is finite and parses exactly — the nDCG
# idiom; POWER(0.9, d) in-engine is libm-dependent)
_RBO_POWS = [1.0]
for _ in range(_RBO_K - 1):
    _RBO_POWS.append(_RBO_POWS[-1] * 0.9)


def _pow_lit(d: int) -> str:
    return f"CAST('{format(_Dec(_RBO_POWS[d]), 'f')}' AS DOUBLE)"


_O_CONTRIB = " + ".join(
    f"({_pow_lit(d - 1)} * ov{d} / {d}.0)" for d in range(1, _RBO_K + 1)
)
_O_OVS = ", ".join(
    f"CAST(COUNT(*) FILTER (WHERE m <= {d}) AS BIGINT) AS ov{d}"
    for d in range(1, _RBO_K + 1)
)


@query(
    "eval_rank_rbo",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), q AS (
      SELECT emb AS q_emb FROM e WHERE vec_id = {_RBO_QID}
    ), ranked AS (
      SELECT e.vec_id,
             ROW_NUMBER() OVER (ORDER BY
               {o_cosine("e.emb", "q.q_emb")} DESC, e.vec_id) AS rank_a,
             ROW_NUMBER() OVER (ORDER BY
               {o_cosine(f"e.emb[1:{_PREFIX}]", f"q.q_emb[1:{_PREFIX}]")}
               DESC, e.vec_id) AS rank_b
      FROM e CROSS JOIN q
    ), m AS (
      SELECT GREATEST(rank_a, rank_b) AS m FROM ranked
      WHERE rank_a <= {_RBO_K} AND rank_b <= {_RBO_K}
    ), ovs AS (SELECT {_O_OVS} FROM m)
    SELECT CAST({_RBO_K} AS BIGINT) AS k,
           CAST(900 AS BIGINT) AS p_milli,
           ov1, ov5, ov10,
           0.1 * ({_O_CONTRIB}) AS rbo
    FROM ovs
    """,
)
def eval_rank_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated RBO@10 between the full and 16-dim-prefix cosine
    rankings — see module docstring.  The corpus is scanned once
    against one broadcast probe; both rank windows ride the same
    scored frame; everything after the rank filter is a ≤10-row
    fold."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = emb.where(F.col("vec_id") == _RBO_QID).select(
        F.col("emb").alias("q_emb")
    )
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id",
        cosine_similarity(F.col("emb"), F.col("q_emb")).alias("sim_a"),
        cosine_similarity(
            F.slice(F.col("emb"), 1, _PREFIX),
            F.slice(F.col("q_emb"), 1, _PREFIX),
        ).alias("sim_b"),
    )

    # top-k FIRST via orderBy+limit (TakeOrderedAndProject — each
    # partition keeps its local k, the driver merges k·parts rows),
    # THEN rank the ≤10-row frames: ranking the corpus with an
    # unpartitioned window would funnel every row through one task —
    # exactly what the registry-wide window gate flags (and did, in
    # this query's first version)
    def topk(sim: str, rank: str):
        top = scored.orderBy(F.col(sim).desc(), F.col("vec_id")).limit(
            _RBO_K
        )
        return top.select(
            "vec_id",
            F.row_number()
            .over(Window.orderBy(F.col(sim).desc(), F.col("vec_id")))
            .alias(rank),
        )

    m = (
        topk("sim_a", "rank_a")
        .join(topk("sim_b", "rank_b"), "vec_id")
        .select(F.greatest("rank_a", "rank_b").alias("m"))
    )
    ovs = m.agg(
        *[
            F.sum(F.when(F.col("m") <= d, 1).otherwise(0))
            .cast("bigint")
            .alias(f"ov{d}")
            for d in range(1, _RBO_K + 1)
        ]
    )
    contrib = None
    for d in range(1, _RBO_K + 1):
        term = (
            F.lit(_RBO_POWS[d - 1]) * F.col(f"ov{d}") / F.lit(float(d))
        )
        contrib = term if contrib is None else contrib + term
    return ovs.select(
        F.lit(_RBO_K).cast("bigint").alias("k"),
        F.lit(900).cast("bigint").alias("p_milli"),
        "ov1", "ov5", "ov10",
        (F.lit(0.1) * contrib).alias("rbo"),
    )


# --------------------------------------------------------------------------
# multimodal_tiff_dims
# --------------------------------------------------------------------------


@query(
    "multimodal_tiff_dims",
    oracle="""
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'little' ELSE 'big' END
             AS endianness,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(1 + doc_id % 4000) AS BIGINT) AS sum_width,
           CAST(SUM(1 + (doc_id * 11) % 3000) AS BIGINT) AS sum_height,
           TRUE AS all_parsed
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_tiff_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF dims/endianness audit over real header bytes — see module
    docstring."""
    from vector_ai_npm_spark.multimodal.tiff import (
        encode_tiff_header,
        tiff_dims,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def _audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 1 + did % 4000
                h = 1 + (did * 11) % 3000
                little = did % 2 == 0
                payload = encode_tiff_header(w, h, little=little)
                pw, ph, endian = tiff_dims(payload)
                rows.append(
                    (
                        endian, pw, ph,
                        (pw, ph) == (w, h)
                        and endian == ("little" if little else "big"),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["endianness", "width", "height", "ok"]
            )

    # CPU-bound synth+parse over an 8 B/row doc_id frame: spread to
    # executor parallelism (r13 decode-face pattern, r14 audits)
    from vector_ai_npm_spark.io.sources import scale_partitions

    docs = scale_partitions(docs, spark)
    parsed = docs.mapInPandas(
        _audit,
        schema="endianness string, width long, height long, ok boolean",
    )
    return parsed.groupBy("endianness").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum("width").cast("bigint").alias("sum_width"),
        F.sum("height").cast("bigint").alias("sum_height"),
        F.bool_and("ok").alias("all_parsed"),
    )

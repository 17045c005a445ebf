"""Wave 34: binary sign quantization + Hamming re-rank, ColBERT-style
late interaction, top-k catalog coverage.

Three retrieval operators rounding out the quantization / scoring /
evaluation story, each exact and oracle-checked:

* `vector_quantize_binary` — the 32× compression extreme of the PQ/SQ8
  family: one SIGN BIT per dimension (64-dim float vector → two 32-bit
  words = 8 bytes), Hamming-distance shortlist (bit_count of xor —
  integer arithmetic, engine-identical by construction), exact cosine
  re-rank of the top-32 shortlist.  The code columns are BIGINT halves
  (bits 0–31 / 32–63) so no engine touches the sign bit of a 64-bit
  word.  This is the sign-LSH idea applied as a STORED code: at 100 TB
  the Hamming scan reads 8 bytes/row instead of 256 and the
  full-precision vectors are touched only for the 32-row shortlist.
* `retrieval_late_interaction` — ColBERT-style MaxSim scoring over
  multi-vector documents: each 64-dim embedding is viewed as 4
  "token vectors" of 16 dims (deterministic split — the multi-vector
  PLUMBING is what's under test; a real corpus would carry actual
  per-token vectors), and score(q, d) = Σᵢ maxⱼ cos(qᵢ, dⱼ), folded
  in a fixed order (((m1+m2)+m3)+m4) so both engines produce the same
  double.  Late interaction is the publicly-documented retrieval
  quality jump over single-vector cosine (Khattab & Zaharia, ColBERT,
  SIGIR'20); the scale path is the same prune-then-re-rank shape as
  every ANN face here.
* `retrieval_topk_coverage` — aggregate diversity of retrieval: run a
  FIXED probe set of queries, take exact top-5 each, and report
  catalog coverage (distinct retrieved / catalog) and redundancy (the
  most-retrieved item's hit count).  The standard recommender-system
  readout for "is retrieval collapsing onto a head".  Probe count is
  a constant, so total work is probes × one corpus scan.

Cross-engine determinism: integer codes and Hamming everywhere in the
shortlist; cosines via the shared strict-left-fold pair
(functions.vectors.cosine_similarity / o_cosine); rank tiebreaks by
vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.vectors import (
    cosine_similarity,
    o_cosine,
)
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_QUERY_IDS = (0, 7, 42)
_HAM_SHORTLIST = 32
_K = 5

# --- sign-bit code halves (bits 0..31 and 32..63 as positive BIGINTs) ---

_SPARK_LO = (
    "aggregate(sequence(0,31), 0L, (acc, i) -> acc + "
    "IF(element_at(embedding, i + 1) > 0, shiftleft(1L, i), 0L))"
)
_SPARK_HI = (
    "aggregate(sequence(0,31), 0L, (acc, i) -> acc + "
    "IF(element_at(embedding, i + 33) > 0, shiftleft(1L, i), 0L))"
)
_DUCK_LO = (
    "CAST(list_sum(list_transform(range(0,32), i -> CASE WHEN "
    "embedding[i + 1] > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) "
    "AS BIGINT)"
)
_DUCK_HI = (
    "CAST(list_sum(list_transform(range(0,32), i -> CASE WHEN "
    "embedding[i + 33] > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) "
    "AS BIGINT)"
)


@query(
    "vector_quantize_binary",
    oracle=f"""
    WITH codes AS (
      SELECT vec_id, embedding,
             {_DUCK_LO} AS lo, {_DUCK_HI} AS hi
      FROM embeddings
    ), q AS (
      SELECT vec_id AS q_vec_id, embedding AS q_emb,
             lo AS q_lo, hi AS q_hi
      FROM codes WHERE vec_id IN {_QUERY_IDS}
    ), ham AS (
      SELECT q.q_vec_id, c.vec_id, c.embedding, q.q_emb,
             bit_count(xor(c.lo, q.q_lo))
               + bit_count(xor(c.hi, q.q_hi)) AS hamming
      FROM codes c CROSS JOIN q
    ), short AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY q_vec_id ORDER BY hamming, vec_id
             ) AS hrk
      FROM ham
    ), rer AS (
      SELECT q_vec_id, vec_id, hamming,
             ROW_NUMBER() OVER (
               PARTITION BY q_vec_id
               ORDER BY {o_cosine("embedding", "q_emb")} DESC, vec_id
             ) AS rank
      FROM short WHERE hrk <= {_HAM_SHORTLIST}
    )
    SELECT CAST(q_vec_id AS BIGINT) AS q_vec_id,
           CAST(vec_id AS BIGINT) AS vec_id,
           CAST(rank AS BIGINT) AS rank,
           CAST(hamming AS BIGINT) AS hamming
    FROM rer WHERE rank <= {_K}
    """,
)
def vector_quantize_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit quantization + Hamming shortlist + exact re-rank — see
    module docstring.  The Hamming stage reads only the two BIGINT
    code columns (8 bytes/row); full vectors are hydrated for the
    ≤32-row shortlist.  The per-query windows partition on 3 probe
    ids; at corpus scale the shortlist stage would ride orderBy+limit
    per probe (TakeOrderedAndProject), as the IVF faces do."""
    emb = load_table(spark, sf_dir, "embeddings")
    codes = emb.select(
        "vec_id", "embedding",
        F.expr(_SPARK_LO).alias("lo"),
        F.expr(_SPARK_HI).alias("hi"),
    )
    q = codes.where(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_emb"),
        F.col("lo").alias("q_lo"),
        F.col("hi").alias("q_hi"),
    )
    ham = codes.crossJoin(F.broadcast(q)).select(
        "q_vec_id", "vec_id", "embedding", "q_emb",
        (
            F.bit_count(F.col("lo").bitwiseXOR(F.col("q_lo")))
            + F.bit_count(F.col("hi").bitwiseXOR(F.col("q_hi")))
        ).alias("hamming"),
    )
    wh = Window.partitionBy("q_vec_id").orderBy("hamming", "vec_id")
    short = ham.withColumn("hrk", F.row_number().over(wh)).where(
        F.col("hrk") <= _HAM_SHORTLIST
    )
    wr = Window.partitionBy("q_vec_id").orderBy(
        cosine_similarity(F.col("embedding"), F.col("q_emb")).desc(),
        F.col("vec_id"),
    )
    return (
        short.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= _K)
        .select(
            F.col("q_vec_id").cast("bigint"),
            F.col("vec_id").cast("bigint"),
            F.col("rank").cast("bigint"),
            F.col("hamming").cast("bigint"),
        )
    )


# --- late interaction -----------------------------------------------------

_N_SUB = 4
_DSUB = 16


def _spark_maxsim() -> F.Column:
    """Σᵢ maxⱼ cos(qᵢ, dⱼ) with a FIXED fold order."""
    maxes = []
    for i in range(_N_SUB):
        qi = F.slice(F.col("q_emb"), 1 + i * _DSUB, _DSUB)
        terms = [
            cosine_similarity(
                F.slice(F.col("embedding"), 1 + j * _DSUB, _DSUB), qi
            )
            for j in range(_N_SUB)
        ]
        maxes.append(F.greatest(*terms))
    score = maxes[0]
    for m in maxes[1:]:
        score = score + m
    return score


def _duck_maxsim() -> str:
    parts = []
    for i in range(_N_SUB):
        qi = f"q_emb[{1 + i * _DSUB}:{(i + 1) * _DSUB}]"
        terms = ", ".join(
            o_cosine(f"embedding[{1 + j * _DSUB}:{(j + 1) * _DSUB}]", qi)
            for j in range(_N_SUB)
        )
        parts.append(f"GREATEST({terms})")
    out = parts[0]
    for p in parts[1:]:
        out = f"({out} + {p})"
    return out


@query(
    "retrieval_late_interaction",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
      FROM embeddings
    ), q AS (
      SELECT vec_id AS q_vec_id, embedding AS q_emb
      FROM e WHERE vec_id IN {_QUERY_IDS}
    ), scored AS (
      SELECT q.q_vec_id, e.vec_id,
             {_duck_maxsim()} AS score
      FROM e CROSS JOIN q
    ), ranked AS (
      SELECT q_vec_id, vec_id, score,
             ROW_NUMBER() OVER (
               PARTITION BY q_vec_id ORDER BY score DESC, vec_id
             ) AS rank
      FROM scored
    )
    SELECT CAST(q_vec_id AS BIGINT) AS q_vec_id,
           CAST(vec_id AS BIGINT) AS vec_id,
           CAST(rank AS BIGINT) AS rank, score
    FROM ranked WHERE rank <= 3
    """,
)
def retrieval_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style MaxSim top-3 — see module docstring.  The score
    is 16 slice-cosines + 4 maxes + 3 adds per (query, doc) pair, all
    inside whole-stage codegen; probes broadcast, corpus scanned
    once."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.where(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_emb"),
    )
    scored = emb.crossJoin(F.broadcast(q)).select(
        "q_vec_id", "vec_id", _spark_maxsim().alias("score")
    )
    w = Window.partitionBy("q_vec_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            F.col("q_vec_id").cast("bigint"),
            F.col("vec_id").cast("bigint"),
            F.col("rank").cast("bigint"),
            "score",
        )
    )


# --- top-k coverage ---------------------------------------------------------

_PROBE_IDS = (0, 7, 42, 100, 200, 300, 400)


@query(
    "retrieval_topk_coverage",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), q AS (
      SELECT vec_id AS q_vec_id, emb AS q_emb
      FROM e WHERE vec_id IN {_PROBE_IDS}
    ), ranked AS (
      SELECT q.q_vec_id, e.vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.q_vec_id
               ORDER BY {o_cosine("e.emb", "q.q_emb")} DESC, e.vec_id
             ) AS rank
      FROM e CROSS JOIN q
    ), topk AS (
      SELECT q_vec_id, vec_id FROM ranked WHERE rank <= {_K}
    ), per_item AS (
      SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS hits
      FROM topk GROUP BY vec_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM q) AS n_queries,
           CAST({_K} AS BIGINT) AS k,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM topk) AS n_slots,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM per_item)
             AS n_distinct_retrieved,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS catalog_n,
           CAST((SELECT COUNT(*) FROM per_item) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM e) AS DOUBLE) AS coverage,
           (SELECT CAST(MAX(hits) AS BIGINT) FROM per_item)
             AS top_item_hits
    """,
)
def retrieval_topk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate retrieval diversity over a fixed probe set — see
    module docstring.  One corpus scan against 7 broadcast probes;
    every later frame is probe-bounded (≤35 rows)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = emb.where(F.col("vec_id").isin(*_PROBE_IDS)).select(
        F.col("vec_id").alias("q_vec_id"), F.col("emb").alias("q_emb")
    )
    w = Window.partitionBy("q_vec_id").orderBy(
        cosine_similarity(F.col("emb"), F.col("q_emb")).desc(),
        F.col("vec_id"),
    )
    topk = (
        emb.crossJoin(F.broadcast(q))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _K)
        .select("q_vec_id", "vec_id")
    )
    per_item = topk.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("hits")
    )
    catalog = emb.agg(F.count(F.lit(1)).cast("bigint").alias("catalog_n"))
    stats = per_item.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_retrieved"),
        F.max("hits").cast("bigint").alias("top_item_hits"),
    )
    counts = topk.agg(
        F.count_distinct("q_vec_id").cast("bigint").alias("n_queries"),
        F.count(F.lit(1)).cast("bigint").alias("n_slots"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(catalog))
        .select(
            "n_queries",
            F.lit(_K).cast("bigint").alias("k"),
            "n_slots",
            "n_distinct_retrieved",
            "catalog_n",
            (
                F.col("n_distinct_retrieved").cast("double")
                / F.col("catalog_n").cast("double")
            ).alias("coverage"),
            "top_item_hits",
        )
    )

"""Int8 scalar quantization of embeddings (wave 13) — the third leg of
the quantization family next to PQ (retrieval/pq.py, 32× compression,
trained codebooks) and Matryoshka truncation (retrieval/matryoshka.py):
SQ8 is the UNTRAINED 4× compression every production vector store
offers (FAISS `SQ8` / pgvector `halfvec`-class tradeoff) — per-dimension
min/max affine quantization to uint8 codes.

    code_d(v) = floor((v − min_d) · 255 / (max_d − min_d) + 0.5)
    dequant_d(c) = min_d + c · (max_d − min_d) / 255

Determinism note: `floor(x + 0.5)` replaces round() because engines
disagree on round-half semantics (banker's vs half-away) exactly at
representable .5 boundaries; floor is exact in both.  The per-dim
stats frame and every per-row expression are identical double chains,
so the CODES are integer-exact cross-engine and the registry face is
fully hash-checkable — the reconstruction-error bound
|v − dequant(code(v))| ≤ step/2 rides along as a contract boolean.

Scale shape: the stats pass is one posexplode → (dim)-keyed min/max —
dim-sized state (64 rows), map-side combined; codes are a map-only
pass with the stats BROADCAST back.  No corpus-scale shuffle at all;
at 100 TB this is two scans, the second fused with the sink write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


def sq8_stats(emb: DataFrame, vec_col: str = "emb") -> DataFrame:
    """(dim, lo, hi) per-dimension min/max — the SQ8 'codebook'."""
    return (
        emb.select(F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    )


def sq8_encode(emb: DataFrame, stats: DataFrame,
               vec_col: str = "emb") -> DataFrame:
    """(vec_id, dim, code, err_ok): uint8 code per dimension plus the
    half-step reconstruction bound check.  A CONSTANT dimension
    (hi == lo — e.g. a zero-padded dim) would make the affine map
    0/0 → NaN with engine-divergent NULL semantics, so it encodes as
    the deterministic code 0 with a trivially-true bound (dequant
    reproduces the constant exactly)."""
    ex = emb.select("vec_id", F.posexplode(vec_col).alias("dim", "v"))
    j = ex.join(F.broadcast(stats), "dim")
    degenerate = F.col("hi") == F.col("lo")
    step = (F.col("hi") - F.col("lo")) / F.lit(255.0)
    code = F.when(degenerate, F.lit(0)).otherwise(
        F.floor(
            (F.col("v") - F.col("lo")) * F.lit(255.0)
            / (F.col("hi") - F.col("lo"))
            + F.lit(0.5)
        )
    ).cast("long")
    deq = F.col("lo") + code.cast("double") * step
    return j.select(
        "vec_id",
        "dim",
        code.alias("code"),
        (F.abs(F.col("v") - deq) <= step / F.lit(2.0) + F.lit(1e-12))
        .alias("err_ok"),
    )


@query(
    "vector_quantize_sq8",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             CAST(embedding[CAST(d AS INTEGER)] AS DOUBLE) AS v,
             CAST(d AS BIGINT) - 1 AS dim
      FROM embeddings,
           UNNEST(range(1, len(embedding) + 1)) AS t(d)
    ), stats AS (
      SELECT dim, MIN(v) AS lo, MAX(v) AS hi FROM e GROUP BY dim
    ), codes AS (
      SELECT e.vec_id, e.dim,
             CAST(CASE WHEN s.hi = s.lo THEN 0
                  ELSE floor((e.v - s.lo) * 255.0 / (s.hi - s.lo) + 0.5)
                  END AS BIGINT) AS code,
             (abs(e.v - (s.lo + (CASE WHEN s.hi = s.lo THEN 0
                   ELSE floor((e.v - s.lo) * 255.0 / (s.hi - s.lo) + 0.5)
                   END) * ((s.hi - s.lo) / 255.0)))
                <= (s.hi - s.lo) / 255.0 / 2.0 + 1e-12) AS err_ok
      FROM e JOIN stats s ON s.dim = e.dim
    )
    SELECT vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_dims,
           CAST(SUM(code) AS BIGINT) AS code_sum,
           CAST(SUM(code * (dim + 1)) AS BIGINT) AS code_weighted,
           bool_and(code BETWEEN 0 AND 255) AS codes_in_range,
           bool_and(err_ok) AS err_ok
    FROM codes GROUP BY vec_id
    """,
)
def vector_quantize_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 encode of the embeddings table with integer-exact code
    checksums (plain + position-weighted, so a permutation cannot hide)
    and the half-step reconstruction contract — see module docstring."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    stats = sq8_stats(emb)
    codes = sq8_encode(emb, stats)
    return codes.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.sum("code").alias("code_sum"),
        F.sum(F.col("code") * (F.col("dim") + 1)).alias("code_weighted"),
        F.expr("bool_and(code BETWEEN 0 AND 255)").alias("codes_in_range"),
        F.expr("bool_and(err_ok)").alias("err_ok"),
    )

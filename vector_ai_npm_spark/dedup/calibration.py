"""MinHash estimator calibration (wave 11).

`dedup_minhash_estimate` closes the loop the LSH dedup family leaves
open: the banded candidate generator (dedup_minhash_pairs) and the
exact verifier (dedup_ngram_jaccard) exist separately, but a production
pipeline TUNES its band/row/threshold choices by measuring how well the
k-hash signature estimate ĵ = (matching hashes)/k tracks the true
shingle Jaccard on real candidates — E[ĵ] = J is the MinHash guarantee
(Broder 1997), and the empirical |ĵ − J| distribution at k=8 is what
justifies (or indicts) the banding S-curve in use.

One row per banded candidate pair: signature agreement, estimated and
exact Jaccard, absolute error.  Everything is integer counting plus
final single divisions — fully hash-checkable cross-engine.

Scale design (100 TB): the pair frame is the banded-LSH output
(output-bound); signatures attach by two doc-keyed joins of the
signature table (8 int64s per doc — the frame a production run already
persists); the exact-Jaccard leg joins the DISTINCT (doc, shingle)
frame per pair side on the shingle key, cost proportional to candidate
pairs × shingles-per-doc — the same budget as the ngram-Jaccard
verifier it calibrates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.dedup.queries import (
    _BAND_KEYS_DUCK,
    _duck_minhash,
    _DUCK_SHINGLES,
    _SPARK_SHINGLES,
    N_MINHASH,
    dedup_minhash_pairs,
    dedup_minhash_signature,
)
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_O_SIG = ", ".join(f"{_duck_minhash(i)} AS mh{i}" for i in range(N_MINHASH))
_O_MATCH = " + ".join(
    f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)"
    for i in range(N_MINHASH)
)


@query(
    "dedup_minhash_estimate",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles
                FROM documents),
    sig AS MATERIALIZED (SELECT doc_id, {_O_SIG} FROM sh),
    bands AS (SELECT doc_id, unnest([{", ".join(_BAND_KEYS_DUCK)}])
                AS band_key FROM sig),
    pairs AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      FROM bands a JOIN bands b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    ds AS MATERIALIZED (
      SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM ds
           GROUP BY doc_id),
    inter AS (
      SELECT p.doc_id_a, p.doc_id_b, CAST(COUNT(*) AS BIGINT) AS i
      FROM pairs p
      JOIN ds a ON a.doc_id = p.doc_id_a
      JOIN ds b ON b.doc_id = p.doc_id_b AND a.s = b.s
      GROUP BY p.doc_id_a, p.doc_id_b)
    SELECT p.doc_id_a, p.doc_id_b,
           CAST({_O_MATCH} AS BIGINT) AS n_match,
           CAST({_O_MATCH} AS DOUBLE) / {N_MINHASH} AS jaccard_est,
           COALESCE(i.i, 0) AS intersection,
           za.n + zb.n - COALESCE(i.i, 0) AS union_,
           CAST(COALESCE(i.i, 0) AS DOUBLE)
             / CAST(za.n + zb.n - COALESCE(i.i, 0) AS DOUBLE)
             AS jaccard_exact,
           ABS(CAST({_O_MATCH} AS DOUBLE) / {N_MINHASH}
               - CAST(COALESCE(i.i, 0) AS DOUBLE)
                 / CAST(za.n + zb.n - COALESCE(i.i, 0) AS DOUBLE))
             AS abs_err
    FROM pairs p
    JOIN sig a ON a.doc_id = p.doc_id_a
    JOIN sig b ON b.doc_id = p.doc_id_b
    LEFT JOIN inter i ON i.doc_id_a = p.doc_id_a
                     AND i.doc_id_b = p.doc_id_b
    JOIN sz za ON za.doc_id = p.doc_id_a
    JOIN sz zb ON zb.doc_id = p.doc_id_b
    """,
)
def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-estimate vs exact Jaccard per banded candidate pair —
    see module docstring."""
    docs = load_table(spark, sf_dir, "documents")
    # checkpoint the three reused frames at their natural persist
    # points (a production pipeline stores all three): the output-bound
    # candidate pairs, the 8-int64-per-doc signature table (consumed by
    # both pair sides), and the distinct (doc, shingle) index (consumed
    # by both sides of the intersection join + the size table) —
    # measured 8 Generates / 10 scans without them
    pairs = dedup_minhash_pairs(spark, sf_dir).localCheckpoint(eager=True)
    sig = dedup_minhash_signature(spark, sf_dir).localCheckpoint(eager=True)
    a = sig.select(
        F.col("doc_id").alias("doc_id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_MINHASH)],
    )
    b = sig.select(
        F.col("doc_id").alias("doc_id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_MINHASH)],
    )
    n_match = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    ).cast("long")
    # ds stays UNcheckpointed deliberately: it is a map-only explode
    # (scan → shingle rows, no shuffle), so re-deriving it per consumer
    # costs a scan each, while eagerly materializing corpus × shingle
    # STRINGS to executor disk costs more than the scans it saves —
    # the opposite trade from the shuffled sig/pairs frames above
    ds = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(_SPARK_SHINGLES))).alias("s"),
    )
    sz = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        pairs.join(ds.withColumnRenamed("doc_id", "doc_id_a"), "doc_id_a")
        .join(
            ds.select(
                F.col("doc_id").alias("doc_id_b"), F.col("s")
            ),
            ["doc_id_b", "s"],
        )
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    iv = F.coalesce("i", F.lit(0).cast("long"))
    uni = F.col("za") + F.col("zb") - iv
    est = n_match.cast("double") / F.lit(float(N_MINHASH))
    exact = iv.cast("double") / uni.cast("double")
    return (
        pairs.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .join(inter, ["doc_id_a", "doc_id_b"], "left")
        .join(
            sz.select(F.col("doc_id").alias("doc_id_a"),
                      F.col("n").alias("za")),
            "doc_id_a",
        )
        .join(
            sz.select(F.col("doc_id").alias("doc_id_b"),
                      F.col("n").alias("zb")),
            "doc_id_b",
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            n_match.alias("n_match"),
            est.alias("jaccard_est"),
            iv.alias("intersection"),
            uni.cast("long").alias("union_"),
            exact.alias("jaccard_exact"),
            F.abs(est - exact).alias("abs_err"),
        )
    )

"""Uniform negative sampling for contrastive training (wave 17).

`sample_negative_uniform` — the data-side half of contrastive /
triplet training (in-batch negatives' offline cousin, and the
complement of `mine_hard_negatives`'s similarity-ranked picks): per
anchor vector, k uniform negatives drawn deterministically by hash,
with the anchor itself excluded and the draw reproducible across
engines (the md5 idiom every sampling face here uses — seedless,
partitioning-stable).

Draw rule (identical in both engines): for anchor a and slot j,
    raw = md5_mod(a, "#neg{{j}}", n)            -- uniform in [0, n)
    neg = raw + 1 + ((raw >= a) ? 1 : 0) would bias; instead use
    neg = raw if raw != a else (raw + 1) mod n  -- minimal collision fix
The collision fix keeps uniformity to O(1/n) (one value gets doubled
mass only when the hash lands exactly on the anchor), which is the
standard cheap correction; exact uniformity would need rejection
loops that don't vectorize.

Label columns make the output audit-ready: `same_label` marks
false-negative candidates (same class as the anchor) — the rate a
curriculum pipeline monitors before training.

Scale shape: map-only over the anchor frame (k rows out per anchor),
one broadcast join to attach the negative's label (the vec→label dim
is id-keyed; at 100 TB this is the bucketed-join case).  No shuffle of
the vector column — ids only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_K_NEG = 3


@query(
    "sample_negative_uniform",
    oracle=f"""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM embeddings),
    anchors AS (
      SELECT vec_id AS anchor_id, label AS anchor_label FROM embeddings
    ),
    draws AS (
      SELECT a.anchor_id, a.anchor_label, j.slot,
             (CAST('0x' || substring(md5(CAST(a.anchor_id AS VARCHAR)
                                         || '#neg' || j.slot), 1, 8)
                   AS BIGINT) % n.n_vecs) AS raw,
             n.n_vecs
      FROM anchors a
      CROSS JOIN (VALUES {", ".join(f"({j})" for j in range(_K_NEG))})
        AS j(slot)
      CROSS JOIN n
    ),
    picked AS (
      SELECT anchor_id, anchor_label, CAST(slot AS BIGINT) AS slot,
             CASE WHEN raw = anchor_id THEN (raw + 1) % n_vecs
                  ELSE raw END AS neg_id
      FROM draws
    )
    SELECT p.anchor_id, p.slot, p.neg_id,
           p.anchor_label, e.label AS neg_label,
           p.anchor_label = e.label AS same_label
    FROM picked p JOIN embeddings e ON e.vec_id = p.neg_id
    """,
)
def sample_negative_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k={_K_NEG} deterministic uniform negatives per anchor — see
    module docstring.  Relies on the fixture's dense 0..n−1 vec_id
    domain (asserted by the join: a missing id would drop a row and
    fail the count gate)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    anchors = emb.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
    )
    draws = (
        anchors.crossJoin(F.broadcast(n))
        .select(
            "anchor_id",
            "anchor_label",
            "n_vecs",
            F.explode(
                F.array(*[F.lit(j) for j in range(_K_NEG)])
            ).alias("slot"),
        )
        .select(
            "anchor_id",
            "anchor_label",
            "n_vecs",
            F.col("slot").cast("bigint").alias("slot"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("anchor_id").cast("string"),
                                F.lit("#neg"),
                                F.col("slot").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("n_vecs")
            ).alias("raw"),
        )
    )
    picked = draws.select(
        "anchor_id",
        "anchor_label",
        "slot",
        F.when(
            F.col("raw") == F.col("anchor_id"),
            (F.col("raw") + 1) % F.col("n_vecs"),
        )
        .otherwise(F.col("raw"))
        .alias("neg_id"),
    )
    labels = emb.select(
        F.col("vec_id").alias("neg_id"), F.col("label").alias("neg_label")
    )
    return picked.join(F.broadcast(labels), "neg_id").select(
        "anchor_id",
        "slot",
        "neg_id",
        "anchor_label",
        "neg_label",
        (F.col("anchor_label") == F.col("neg_label")).alias("same_label"),
    )

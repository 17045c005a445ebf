"""The production-threshold face of embedding dedup (LSH-routed).

The fixture's random vectors have no pairs above cosine 0.47, so the
production threshold (0.95) would trivially return zero rows. This query
therefore PLANTS a near-duplicate per vector — v' = normalize(v + 0.03·e₀),
cosine(v, v') ≈ 0.9995 — unions it with the originals, and runs the
auto-routed dedup at t=0.95, which takes the LSH-pruned path
(embedding_router.lsh_pairs). Expected output: exactly the 500·sf planted
pairs (originals are near-orthogonal; the exact re-rank kills every false
candidate), so the query is fully ORACLE-CHECKABLE even though candidate
generation is approximate — the test pins recall 1.0, not "roughly right".

Float parity discipline: the perturbed vector and the cosine are computed
with identical double ops in identical fold order in both engines
(functions.vectors), and the cosine is rounded to 6dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.dedup.embedding_router import embedding_dedup_pairs
from vector_ai_npm_spark.functions.vectors import o_cosine
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

PLANT_OFFSET = 100_000
_EPS = 0.03

# DuckDB mirror of the planted vector: elem 1 gets +0.03, all elems cast
# to double, then the whole list is divided by its L2 norm — same left
# folds as functions.vectors.
_DUCK_PERT = (
    "list_prepend(CAST(embedding[1] AS DOUBLE) + 0.03, "
    "list_transform(embedding[2:], x -> CAST(x AS DOUBLE)))"
)
_DUCK_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(pert, x -> x * x)), (acc, v) -> acc + v))"
)


def planted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """originals ∪ planted near-dups (vec_id + PLANT_OFFSET)."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr = F.col("embedding").cast("array<double>")
    pert = F.transform(
        arr, lambda x, i: F.when(i == 0, x + F.lit(_EPS)).otherwise(x)
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(pert, lambda x: x * x), F.lit(0.0), lambda a, b: a + b
        )
    )
    planted = emb.select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        "label",
        F.transform(pert, lambda x: x / norm).alias("embedding"),
    )
    return emb.select("vec_id", "label", arr.alias("embedding")).unionByName(
        planted
    )


@query(
    "dedup_embedding_ann",
    oracle=f"""
    WITH pertd AS (
      SELECT vec_id + {PLANT_OFFSET} AS vec_id, label,
             {_DUCK_PERT} AS pert
      FROM embeddings
    ), planted AS (
      SELECT vec_id, label,
             list_transform(pert, x -> x / {_DUCK_NORM}) AS embedding
      FROM pertd
    ), corpus AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
      FROM embeddings
      UNION ALL SELECT * FROM planted
    )
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           ROUND({o_cosine('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM corpus a JOIN corpus b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {o_cosine('a.embedding', 'b.embedding')} >= 0.95
    """,
)
def dedup_embedding_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18d at the PRODUCTION threshold: auto-route → LSH prune + exact
    re-rank, oracle-checked against the exact all-pairs SQL (sound
    because the exact re-rank gives precision 1.0 and the planted-dup
    distance gap gives recall 1.0 — pinned in tests/test_dedup.py)."""
    # The LSH route consumes its input FIVE times (size/dim stats, both
    # sides of the band self-join, both sides of the vector re-join);
    # without persistence each consumer re-runs the parquet scan + the
    # perturb/normalize transform. Iterative-reuse persist is the same
    # discipline MLlib applies to training inputs; MEMORY_AND_DISK spills
    # rather than OOMs when the corpus outgrows executor storage.
    from pyspark.storagelevel import StorageLevel

    corpus = planted_corpus(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pairs = embedding_dedup_pairs(corpus, threshold=0.95, mode="auto")
    return pairs.select(
        "vec_id_a", "vec_id_b", F.round("cosine", 6).alias("cosine")
    )

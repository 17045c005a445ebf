"""The 100 TB similarity path: LSH candidate pruning + exact re-rank.

BASELINE.json north-star: "Batch index build via MLlib". Brute-force
cosine scans the whole store per query — fine for one query over sf0.1,
wrong at 100 TB × many queries. The batch-index pattern:

  1. index build (offline, once): BucketedRandomProjectionLSH fitted on
     the store; persist store_df + hash buckets as a parquet index table
     partitioned by bucket — this is the "batch index build" artifact.
  2. query (batch): approxSimilarityJoin(store, queries, dist_thresh) —
     only same-bucket pairs are compared (a bucket-equi join, shuffle on
     bucket id, no cross product).
  3. exact re-rank: cosine on the surviving candidates, window top-k.

Online single-query ANN serving is explicitly out of scope
(BASELINE.json); tests assert batch recall ≥ 0.9 vs the exact top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.vectors import cosine_similarity


def build_lsh_model(store: DataFrame, vec_col: str = "embedding",
                    bucket_length: float = 2.0, num_hash_tables: int = 3,
                    seed: int = 42):
    """Fit a BucketedRandomProjectionLSH model on the store (index build)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = store.withColumn("_features", array_to_vector(F.col(vec_col)))
    lsh = BucketedRandomProjectionLSH(
        inputCol="_features",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    return lsh.fit(vecs), vecs


def scaled_hash_tables(n_rows: int, base: int = 3) -> int:
    """Corpus-scaled OR-amplification: +2 hash tables per decade of
    corpus beyond the 2k-row tuning scale.

    The r11 sf1 sweep caught the fixed-3-table setup at 0.87 aggregate
    recall on 20k fresh-draw vectors (true neighbors inside the
    distance threshold but never sharing a bucket across only 3
    tables); each extra table multiplies the per-pair miss probability
    by the single-table miss rate, so a log-scaled table count holds
    the recall floor while the index cost grows logarithmically with
    the corpus — the §4t probed-scaled-budget discipline applied to
    LSH.  At ≤2k rows this returns ``base`` exactly, so every sf0.01 /
    sf0.1 hash and pin is unchanged."""
    from vector_ai_npm_spark.retrieval.scaling import corpus_decades

    return base + 2 * corpus_decades(n_rows)


def ann_similarity_join(queries: DataFrame, store: DataFrame, k: int = 5,
                        dist_threshold: float = 1.2,
                        q_id: str = "q_vec_id", q_vec: str = "q_embedding",
                        s_vec: str = "embedding",
                        tiebreak: str = "vec_id",
                        num_hash_tables: int | None = None) -> DataFrame:
    """LSH-pruned B9: same output contract as search.similarity_join but
    the candidate set is bucket-joined instead of a full cross product.

    dist_threshold is EUCLIDEAN (what BRP-LSH buckets); on unit-norm
    vectors d² = 2(1−cos), so d ≤ 1.2 keeps cos ≥ 0.28 candidates.
    ``num_hash_tables=None`` scales the table count with the corpus
    (:func:`scaled_hash_tables`)."""
    from pyspark.ml.functions import array_to_vector

    if num_hash_tables is None:
        num_hash_tables = scaled_hash_tables(store.count())
    model, store_vecs = build_lsh_model(
        store, s_vec, num_hash_tables=num_hash_tables
    )
    query_vecs = queries.withColumn("_features", array_to_vector(F.col(q_vec)))

    pairs = model.approxSimilarityJoin(
        store_vecs, query_vecs, dist_threshold, distCol="_dist"
    )
    sim = cosine_similarity(
        F.col(f"datasetA.{s_vec}"), F.col(f"datasetB.{q_vec}")
    ).alias("similarity")
    w = Window.partitionBy(q_id).orderBy(
        F.col("similarity").desc(), F.col(tiebreak).asc()
    )
    return (
        pairs.select(
            F.col(f"datasetB.{q_id}").alias(q_id),
            F.col(f"datasetA.{tiebreak}").alias(tiebreak),
            sim,
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )

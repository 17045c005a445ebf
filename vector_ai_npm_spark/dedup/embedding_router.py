"""Embedding near-dup pairs: threshold-adaptive route (exact ⇄ LSH).

The 100 TB decision tree for "find all pairs with cosine ≥ t":

  t ≥ ~0.7 (real near-dup territory)  → LSH prune + exact re-rank.
      On unit-norm vectors cosine ≥ t ⟺ euclidean d ≤ √(2−2t); at
      t=0.95 that is d ≤ 0.316 while unrelated pairs sit near √2 — a
      4.5× distance gap that BucketedRandomProjectionLSH converts into
      bucket-equi-join candidates (no cross product, shuffle on bucket
      id). Measured on the fixture with planted dups: recall 1.0, zero
      false candidates surviving the exact re-rank.

  t < ~0.7 on near-orthogonal data     → exact blocked grid join.
      Here the true-pair/random-pair distance ratio collapses (t=0.4 ⇒
      1.10 vs 1.41), so ANY sub-quadratic candidate scheme must either
      drop true pairs (recall < 1 — wrong answers) or emit nearly all
      pairs (no pruning + LSH overhead). Low-threshold all-pairs is
      intrinsically O(n²): the honest plan is the salted grid join that
      at least parallelizes perfectly. At scale you don't run t=0.4
      dedup on 100 TB — you run t≥0.9; the router encodes that.

Reference context: the reference's similarity machinery is a pgvector
`ORDER BY embedding <=> $1 LIMIT k` (vector-client.ts:402-404); a
corpus-wide near-dup pair join has no reference counterpart and follows
the published MinHash/LSH dedup playbook instead.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.vectors import cosine_similarity

# Below this threshold LSH pruning is unsound on near-orthogonal data
# (see module docstring); route exact.
LSH_MIN_THRESHOLD = 0.7


def exact_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    salt: int = 4,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold within blocks, salted grid join.

    A plain self-join on `block_col` shuffles on ~#blocks keys ⇒ at most
    #blocks busy tasks no matter the cluster. The grid rewrite salts both
    sides (salt = id % S) and joins on (block, salt_a, salt_b): each of
    the S² cells per block is an independent shuffle key, restoring full
    parallelism at an S× replication of the (narrow) inputs. Every
    unordered pair lands in exactly one cell ⇒ identical results to the
    naive join.
    """
    cols = [id_col, vec_col] + ([block_col] if block_col else [])
    base = emb.select(*cols, (F.col(id_col) % salt).alias("_salt"))
    grid = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_other")
    a = base.select("*", grid).alias("a")
    b = base.select("*", grid).alias("b")
    cond = (
        (F.col(f"a._other") == F.col("b._salt"))
        & (F.col(f"b._other") == F.col("a._salt"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    )
    if block_col:
        cond = (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")) & cond
    cos = cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias(f"{id_col}_a"),
            F.col(f"b.{id_col}").alias(f"{id_col}_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def lsh_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    bucket_length: float = 0.15,
    num_hash_tables: int = 5,
    seed: int = 42,
) -> DataFrame:
    """LSH-pruned pairs: BRP-LSH bucket-join candidates + exact re-rank.

    Candidates are pairs sharing ≥1 hash bucket (an equi-join on bucket
    id — shuffle-bound, never a cross product); the exact cosine filter
    then removes every false positive, so precision is always 1.0 and
    only recall depends on the LSH parameters. Assumes ~unit-norm
    vectors (cosine ⇒ euclidean translation); re-rank is on true cosine
    so mild norm drift only perturbs candidate generation.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    dist = math.sqrt(max(0.0, 2.0 - 2.0 * threshold)) * 1.001  # fp headroom
    cols = [id_col, vec_col] + ([block_col] if block_col else [])
    vecs = emb.select(*cols).withColumn(
        "_features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_features",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, dist, distCol="_dist")
    cond = F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}")
    if block_col:
        cond = cond & (
            F.col(f"datasetA.{block_col}") == F.col(f"datasetB.{block_col}")
        )
    cos = cosine_similarity(
        F.col(f"datasetA.{vec_col}"), F.col(f"datasetB.{vec_col}")
    )
    return (
        pairs.where(cond)
        .select(
            F.col(f"datasetA.{id_col}").alias(f"{id_col}_a"),
            F.col(f"datasetB.{id_col}").alias(f"{id_col}_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def embedding_dedup_pairs(
    emb: DataFrame,
    threshold: float,
    mode: str = "auto",
    **kwargs,
) -> DataFrame:
    """Route by threshold: LSH prune when sound (t ≥ 0.7), exact below.

    mode: "auto" (default), "lsh", or "exact".
    """
    if mode == "auto":
        mode = "lsh" if threshold >= LSH_MIN_THRESHOLD else "exact"
    if mode == "lsh":
        return lsh_pairs(emb, threshold, **kwargs)
    if mode == "exact":
        return exact_pairs(emb, threshold, **kwargs)
    raise ValueError(f"unknown mode {mode!r} (auto|lsh|exact)")

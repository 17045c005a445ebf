"""OPQ (optimized product quantization): rotate, THEN product-quantize.

Completes the quantization family (PQ 32× → retrieval.pq, SQ8 4× →
retrieval.sq, MRL truncation → retrieval.matryoshka, PCA/ZCA →
retrieval.fusion): plain PQ chops the vector into m contiguous
subspaces, so correlated dimensions land in different codebooks and
waste code entropy.  OPQ first applies an orthogonal rotation R chosen
to decorrelate and variance-balance the subspaces, then runs standard
PQ in the rotated space — FAISS's `OPQMatrix` preprocessing.

This is the PARAMETRIC solution of Ge, He, Ke, Sun: "Optimized Product
Quantization" (CVPR 2013, §4): under a Gaussian model the optimal R is
PCA followed by EIGENVALUE ALLOCATION — greedily deal the principal
directions (sorted by eigenvalue, largest first) to the subspace with
the smallest current eigenvalue product, balancing per-subspace
variance products (the Gaussian distortion bound is minimized when the
products are equal).  The iterative (non-parametric) OPQ alternates
this with codebook re-fits; the parametric form is its standard
initialization and is deterministic — which is what a hash-checkable
contract face needs.

Engine shape (the PQ discipline): rotation trains driver-side on the
same capped deterministic hash-sample as the IVF/PQ quantizers
(O(sample·dim²) covariance + one dim×dim eigendecomposition,
corpus-size independent); R (a few KB) ships in the Arrow UDF closure;
rotation + encoding ride ONE distributed pass; ADC search is unchanged
(it sees rotated codes and a rotated query — R is applied to the query
on the driver, a dim-sized cost).  Because R is orthogonal, norms and
cosines are preserved, so recon_cos in the rotated space IS the
reconstruction quality in the original space and the exact re-rank can
use the original vectors untouched.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.retrieval.pq import _train_sample

_QUERY_IDS = (0, 7, 42)


def eigenvalue_allocation(eigvals: np.ndarray, m: int) -> np.ndarray:
    """Ge et al. §4's balanced-product permutation: deal directions
    (largest eigenvalue first) to the bucket with the smallest current
    log-product, each bucket capped at dim/m slots.  Returns the column
    permutation `perm` such that rotated dims [i·dsub, (i+1)·dsub) hold
    bucket i's directions."""
    dim = len(eigvals)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    order = np.argsort(-eigvals)  # largest first
    buckets: list[list[int]] = [[] for _ in range(m)]
    logsum = np.zeros(m)
    for idx in order:
        open_b = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(open_b, key=lambda b: logsum[b])
        buckets[b].append(int(idx))
        # log keeps the greedy numerically sane for tiny eigenvalues
        logsum[b] += float(np.log(max(eigvals[idx], 1e-300)))
    return np.array([i for b in buckets for i in b], dtype=np.int64)


def train_opq_rotation(
    store: DataFrame, m: int = 8, vec_col: str = "embedding"
) -> np.ndarray:
    """Fit the parametric-OPQ rotation R (dim × dim, orthogonal) on the
    capped deterministic hash-sample: sample covariance → eigvecs →
    eigenvalue allocation across the m subspaces.  Apply as X @ R."""
    X = _train_sample(store, vec_col)
    Xc = X - X.mean(axis=0, keepdims=True)
    cov = (Xc.T @ Xc) / max(1, len(X) - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    perm = eigenvalue_allocation(eigvals, m)
    return np.ascontiguousarray(eigvecs[:, perm])


def opq_rotate(
    store: DataFrame, R: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Replace ``vec_col`` with its rotated image (one Arrow pass; R
    rides the closure).  Orthogonality makes this norm-preserving."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("array<double>")
    def _rot(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype(np.float64)
        return pd.Series(list(X @ R))

    return store.withColumn(vec_col, _rot(F.col(vec_col).cast("array<double>")))


@query("similarity_search_opq")  # rows-only: codes are model-defined
def similarity_search_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 at scale, variant 4: OPQ-rotated PQ search — rotate store
    (one Arrow pass) → PQ-encode rotated vectors → ADC shortlist over
    codes with the ROTATED query → exact cosine re-rank of the
    shortlist on the ORIGINAL vectors (valid because R is orthogonal:
    the rotated-space ADC ranking approximates the same metric).
    Contract driver-checked by `opq_recall`."""
    from pyspark.sql import Window

    from vector_ai_npm_spark.functions.vectors import cosine_similarity
    from vector_ai_npm_spark.retrieval.pq import (
        pq_adc_search,
        pq_encode,
        train_pq,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    R = train_opq_rotation(emb, m=8)
    rot = opq_rotate(emb, R)
    books = train_pq(rot, m=8, ksub=16)
    codes = pq_encode(rot, books)
    qvec = np.asarray(
        list(emb.where(F.col("vec_id") == 7).select("embedding").first()[0]),
        dtype=np.float64,
    )
    short = pq_adc_search(codes, books, list(qvec @ R), k=20)
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    rescored = (
        short.join(emb.select("vec_id", "embedding"), "vec_id")
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), qlit).alias("similarity"),
        )
        .orderBy(F.col("similarity").desc(), F.col("vec_id").asc())
        .limit(5)
    )
    w = Window.orderBy(F.col("similarity").desc(), F.col("vec_id").asc())
    return rescored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )


@query(
    "opq_recall",
    oracle="""
    SELECT scope, ok FROM (VALUES
      ('rotation_orthogonal', TRUE), ('norms_preserved', TRUE),
      ('allocation_balances', TRUE), ('m_codes_per_vec', TRUE),
      ('codes_in_range', TRUE), ('recon_mean_floor', TRUE),
      ('recon_within_pq_noise', TRUE),
      ('q0_self_top1', TRUE), ('q7_self_top1', TRUE),
      ('q42_self_top1', TRUE), ('agg_overlap_065', TRUE)
    ) t(scope, ok)
    """,
)
def opq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ's contract vs plain PQ and the exact top-k, as oracle-pinned
    booleans (seeded training → deterministic per fixture):

      * rotation_orthogonal — ‖RᵀR − I‖∞ ≤ 1e-9 (driver algebra);
      * norms_preserved — rotated norms equal original norms within
        1e-6 on every row (distributed bool_and, the orthogonality
        check applied to DATA, not just the matrix);
      * allocation_balances — the eigenvalue-allocation permutation's
        per-subspace log-eigenvalue-product spread (max − min) is ≤ the
        naive unpermuted PCA split's spread: the defining property of
        Ge et al.'s balanced allocation;
      * m_codes_per_vec / codes_in_range — the PQ contract survives
        composition;
      * recon_mean_floor — mean recon_cos ≥ 0.6 (the plain-PQ floor:
        rotation must not degrade reconstruction — on this
        near-isotropic fixture the Gaussian OPQ gain is ~0, so the
        contract is parity, not superiority);
      * recon_within_pq_noise — |mean recon_cos(OPQ) − mean
        recon_cos(PQ)| ≤ 0.05: both quantize equally hard data;
      * per-query self rank-1 through ADC on rotated codes + exact
        re-rank, and aggregate top-5 overlap vs exact ≥ 0.65·Σk (the
        ivf_half floor)."""
    from vector_ai_npm_spark.retrieval.pq import (
        pq_adc_search,
        pq_encode,
        train_pq,
    )
    from vector_ai_npm_spark.retrieval.search import similarity_search_topk

    emb = load_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    m = 8
    X = _train_sample(emb, "embedding")
    Xc = X - X.mean(axis=0, keepdims=True)
    cov = (Xc.T @ Xc) / max(1, len(X) - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    perm = eigenvalue_allocation(eigvals, m)
    R = np.ascontiguousarray(eigvecs[:, perm])
    dim = R.shape[0]
    dsub = dim // m
    ortho_ok = bool(
        np.abs(R.T @ R - np.eye(dim)).max() <= 1e-9
    )
    # balanced allocation vs the naive (ascending-order) PCA split
    lg = np.log(np.maximum(eigvals, 1e-300))

    def spread(p: np.ndarray) -> float:
        sums = lg[p].reshape(m, dsub).sum(axis=1)
        return float(sums.max() - sums.min())

    alloc_ok = bool(spread(perm) <= spread(np.arange(dim)) + 1e-12)

    rot = opq_rotate(emb, R).select(
        "vec_id", F.col("embedding").alias("rotated")
    ).join(emb.select("vec_id", "embedding"), "vec_id")
    books = train_pq(
        rot.select("vec_id", F.col("rotated").alias("embedding")),
        m=m, ksub=16,
    )
    enc = pq_encode(
        rot.select("vec_id", F.col("rotated").alias("embedding")),
        books,
    )
    plain_books = train_pq(emb, m=m, ksub=16)
    plain_mean = (
        pq_encode(emb, plain_books)
        .agg(F.avg("recon_cos").alias("mu"))
    )
    norm2 = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda a, x: a + x * x
    )
    norm_ok = rot.agg(
        F.bool_and(
            F.abs(norm2(F.col("rotated")) - norm2(F.col("embedding")))
            <= 1e-6
        ).alias("ok")
    )
    agg = (
        enc.crossJoin(F.broadcast(plain_mean))
        .agg(
            F.bool_and(F.size("codes") == m).alias("m_ok"),
            F.bool_and(
                (F.array_min("codes") >= 0) & (F.array_max("codes") < 16)
            ).alias("range_ok"),
            (F.avg("recon_cos") >= 0.6).alias("mean_ok"),
            (F.abs(F.avg("recon_cos") - F.first("mu")) <= 0.05).alias(
                "noise_ok"
            ),
        )
    )
    head = agg.crossJoin(F.broadcast(norm_ok.select(F.col("ok").alias("n_ok")))).select(
        F.explode(
            F.array(
                F.struct(F.lit("rotation_orthogonal").alias("scope"), F.lit(ortho_ok).alias("ok")),
                F.struct(F.lit("norms_preserved").alias("scope"), F.col("n_ok").alias("ok")),
                F.struct(F.lit("allocation_balances").alias("scope"), F.lit(alloc_ok).alias("ok")),
                F.struct(F.lit("m_codes_per_vec").alias("scope"), F.col("m_ok").alias("ok")),
                F.struct(F.lit("codes_in_range").alias("scope"), F.col("range_ok").alias("ok")),
                F.struct(F.lit("recon_mean_floor").alias("scope"), F.col("mean_ok").alias("ok")),
                F.struct(F.lit("recon_within_pq_noise").alias("scope"), F.col("noise_ok").alias("ok")),
            )
        ).alias("r")
    ).select("r.scope", "r.ok")

    out = [head]
    total = None
    for qid in _QUERY_IDS:
        qvec = np.asarray(
            list(
                emb.where(F.col("vec_id") == qid)
                .select("embedding")
                .first()[0]
            ),
            dtype=np.float64,
        )
        # re-rank budget scales with the scanned code count (the
        # round-8 pq.py lesson: a fixed shortlist starves the exact
        # re-rank as the corpus grows — sf0.1 sweep regression)
        short = pq_adc_search(
            enc, books, list(qvec @ R), k=max(20, n_vecs // 5)
        )
        qlit = F.array(*[F.lit(float(x)) for x in qvec])
        from vector_ai_npm_spark.functions.vectors import cosine_similarity

        top5 = (
            short.join(emb.select("vec_id", "embedding"), "vec_id")
            .select(
                "vec_id",
                cosine_similarity(F.col("embedding"), qlit).alias("sim"),
            )
            .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
            .limit(5)
        )
        exact = similarity_search_topk(
            emb.select("vec_id", "embedding"), list(qvec), threshold=-1.0, k=5
        ).select(F.col("vec_id").alias("e_vec_id"))
        self_ok = top5.orderBy(F.col("sim").desc(), F.col("vec_id").asc()).limit(1).agg(
            F.bool_and(F.col("vec_id") == qid).alias("ok")
        ).select(F.lit(f"q{qid}_self_top1").alias("scope"), "ok")
        ov = top5.join(exact, top5.vec_id == F.col("e_vec_id")).agg(
            F.count(F.lit(1)).alias("n")
        )
        out.append(self_ok)
        total = ov if total is None else total.unionByName(ov)
    agg_ov = total.agg(
        (F.sum("n").cast("double") >= F.lit(0.65 * 15)).alias("ok")
    ).select(F.lit("agg_overlap_065").alias("scope"), "ok")
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.unionByName(agg_ov)

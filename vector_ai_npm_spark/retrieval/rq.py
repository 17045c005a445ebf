"""Residual quantization (RQ): additive multi-stage vector compression.

The FAISS family member beside PQ/OPQ/SQ8/binary that changes the
GEOMETRY of the code rather than the partitioning of dimensions:
instead of splitting the vector into m independent subspaces (PQ),
RQ approximates the WHOLE vector as a sum of nstages codewords, each
stage's codebook trained on the RESIDUALS the previous stages leave
behind (Chen, Guan, Wang: "Approximate Nearest Neighbor Search by
Residual Vector Quantization", Sensors 2010; FAISS
ResidualQuantizer).  At equal byte budget RQ spends its bits where
the variance actually lives, while PQ must split them evenly across
subspaces — on anisotropic embeddings that is the difference between
usable and useless codes.

Engine shape (identical scale story to retrieval/pq.py):

  * training: ONE deterministic hash-sample collect, then nstages
    driver-side Lloyd fits, each on the residual matrix of the sample
    — O(sample · nstages), corpus-size independent;
  * encoding: ONE Arrow-batched distributed pass; the
    (nstages × ksub × dim) codebook tensor (a few KB) ships in the
    UDF closure; greedy per-stage argmin, residual carried in the
    batch;
  * ADC search: cos(q, recon) decomposes additively —
    q · Σ_s C_s[c_s] = Σ_s (q · C_s[c_s]) — so a per-query
    (nstages × ksub) dot-product LUT makes scan cost a lookup-sum
    over codes, exactly PQ's ADC shape; the reconstruction norm
    (ONE float, stored at encode time) closes the cosine.

Reference scope: §2B north-star (ANN family) — the reference client
delegates vector search to pgvector; quantized codes are the part of
the 100 TB memory story pgvector's flat storage does not have.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_ai_npm_spark.retrieval.ivf import _train_centroids
from vector_ai_npm_spark.retrieval.pq import _train_sample


def train_rq(
    store: DataFrame,
    vec_col: str = "embedding",
    nstages: int = 4,
    ksub: int = 16,
    seed: int = 42,
) -> np.ndarray:
    """Stage-wise codebooks on residuals; returns (nstages, ksub, dim).

    Stage 0 fits the sample itself; stage s fits what stages 0..s-1
    could not explain — each later codebook is specialized to the
    actual error distribution, which is why RQ beats an equal-bit PQ
    on anisotropic data."""
    R = _train_sample(store, vec_col)
    dim = R.shape[1]
    books = np.empty((nstages, ksub, dim), dtype=np.float64)
    for s in range(nstages):
        books[s] = _train_centroids(R, nlist=ksub, seed=seed + s)
        b2 = (books[s] * books[s]).sum(axis=1)
        d2 = (
            (R * R).sum(axis=1)[:, None]
            - 2.0 * (R @ books[s].T)
            + b2[None, :]
        )
        R = R - books[s][d2.argmin(axis=1)]
    return books


def rq_encode(
    store: DataFrame,
    books: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One distributed Arrow pass: (id, codes array<int>, recon_norm,
    recon_cos).  Greedy stage-wise encoding (the standard RQ encoder;
    beam search is the quality upgrade, not needed for the contract)."""
    from pyspark.sql.pandas.functions import pandas_udf

    nstages, ksub, dim = books.shape
    b2 = (books * books).sum(axis=2)  # (nstages, ksub)

    @pandas_udf(
        "struct<codes: array<int>, recon_norm: double, recon_cos: double>"
    )
    def _enc(v: pd.Series) -> pd.DataFrame:
        X = np.stack(v.to_numpy()).astype(np.float64)
        n = X.shape[0]
        R = X.copy()
        codes = np.empty((n, nstages), dtype=np.int32)
        recon = np.zeros_like(X)
        for s in range(nstages):
            d2 = (
                (R * R).sum(axis=1)[:, None]
                - 2.0 * (R @ books[s].T)
                + b2[s][None, :]
            )
            c = d2.argmin(axis=1)
            codes[:, s] = c
            step = books[s][c]
            recon += step
            R -= step
        num = (X * recon).sum(axis=1)
        norm_r = np.linalg.norm(recon, axis=1)
        den = np.linalg.norm(X, axis=1) * norm_r
        den[den == 0.0] = 1.0
        return pd.DataFrame(
            {
                "codes": list(codes),
                "recon_norm": norm_r,
                "recon_cos": num / den,
            }
        )

    enc = store.withColumn("_rq", _enc(F.col(vec_col).cast("array<double>")))
    return enc.select(
        id_col,
        F.col("_rq.codes").alias("codes"),
        F.col("_rq.recon_norm").alias("recon_norm"),
        F.col("_rq.recon_cos").alias("recon_cos"),
    )


def rq_adc_search(
    codes_df: DataFrame,
    books: np.ndarray,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k by cosine against RECONSTRUCTIONS without
    decoding: per-stage dot-product LUT (nstages × ksub doubles in the
    closure), lookup-sum per row, divide by the stored recon_norm."""
    from pyspark.sql.pandas.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    lut = books @ q  # (nstages, ksub)
    qn = float(np.linalg.norm(q)) or 1.0
    nstages = books.shape[0]

    @pandas_udf("double")
    def _adc(codes: pd.Series, norms: pd.Series) -> pd.Series:
        C = np.stack(codes.to_numpy()).astype(np.int64)  # (n, nstages)
        dots = lut[np.arange(nstages)[None, :], C].sum(axis=1)
        den = norms.to_numpy().astype(np.float64) * qn
        den[den == 0.0] = 1.0
        return pd.Series(dots / den)

    scored = codes_df.withColumn(
        "adc_cos", _adc(F.col("codes"), F.col("recon_norm"))
    )
    return (
        scored.orderBy(F.col("adc_cos").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "adc_cos")
    )


def build_ivfrq_index(
    store: DataFrame,
    nlist: int = 8,
    nstages: int = 4,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """IVF-RQ: cell pruning over residual codes — the additive twin of
    build_ivfpq_index (pq.py), same build economics: train/assign/
    encode one pass each, index persisted partitioned by cell_id at
    scale, per-cell manifest collected once so searches derive their
    probed-scaled re-rank budget driver-side."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.retrieval.ivf import build_ivf_index

    books = train_rq(store, vec_col=vec_col, nstages=nstages, ksub=ksub)
    assigned, centroids = build_ivf_index(store, vec_col, nlist=nlist)
    codes = rq_encode(store, books, vec_col=vec_col, id_col=id_col)
    index = assigned.select(id_col, "cell_id").join(codes, id_col)
    cents = {r[0]: np.asarray(r[1]) for r in centroids.collect()}
    cell_counts = {
        r.cell_id: r.n
        for r in assigned.groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return index, cents, books, cell_counts


def ivfrq_search_index(
    index: DataFrame,
    cents: dict,
    books: np.ndarray,
    store: DataFrame,
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 4,
    shortlist: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_counts: dict | None = None,
) -> DataFrame:
    """Probe the nprobe nearest cells, stage-LUT ADC shortlist
    (probed-scaled budget — the round-8 fixed-budget lesson, same
    max(4k, probed/5) rule as IVF-PQ), exact cosine re-rank of the
    survivors, top-k."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.functions.vectors import cosine_similarity

    q = np.asarray(query_vec, dtype=np.float64)
    order = sorted(
        cents, key=lambda c: float(((q - cents[c]) ** 2).sum())
    )[:nprobe]
    probed = index.where(F.col("cell_id").isin(*[int(c) for c in order]))
    if shortlist is None:
        if cell_counts is not None:
            n_probed = sum(int(cell_counts.get(c, 0)) for c in order)
        else:
            n_probed = probed.count()
        shortlist = max(4 * k, n_probed // 5)
    short = rq_adc_search(probed, books, query_vec, k=shortlist, id_col=id_col)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    rescored = (
        short.join(store.select(id_col, vec_col), id_col)
        .select(
            id_col,
            cosine_similarity(F.col(vec_col), qlit).alias("similarity"),
        )
        .orderBy(F.col("similarity").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return rescored.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("similarity").desc(), F.col(id_col).asc())
        ).cast("long"),
    )

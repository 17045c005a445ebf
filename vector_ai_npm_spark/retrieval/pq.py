"""Product quantization (PQ): 32× vector compression for ANN at scale.

The third batch-index shape beside LSH (retrieval.lsh) and IVF
(retrieval.ivf), and the one that changes the MEMORY story: a 64-dim
float32 vector is 256 bytes; its PQ code (m=8 subspaces × 1 byte) is 8.
At 100 TB of embeddings that is the difference between "the candidate
set fits in executor memory" and "it doesn't" — FAISS's IVF-PQ pairs
exactly these two stages (Jégou, Douze, Schmid: "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

How it works: split each vector into m contiguous subvectors; run
k-means with ksub centroids independently per subspace (on a capped
driver-side sample — the IVF recipe, retrieval/ivf.py:31-37); a
vector's code is its m nearest-centroid ids. Search uses ADC
(asymmetric distance computation): per query, precompute an (m × ksub)
lookup table of subspace distances, then any stored vector's
approximate distance is m table lookups summed — no decode.

Engine shape:
  * training: one deterministic hash-sample collect + m driver-side
    Lloyd fits (each a GEMM per iteration) — O(sample), corpus-size
    independent.
  * encoding: ONE Arrow-batched distributed pass; the (m × ksub × dsub)
    codebook (a few KB) ships in the UDF closure.
  * ADC search: the LUT (m × ksub doubles) folds into the UDF closure
    per query; scan cost is a table-lookup sum over codes — pair with
    the IVF cell pruning for the full IVF-PQ pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_ai_npm_spark.retrieval.ivf import _TRAIN_SAMPLE_CAP, _train_centroids


def _train_sample(store: DataFrame, vec_col: str) -> np.ndarray:
    """Deterministic content-hash sample collected to the driver
    (identical mechanism to build_ivf_index — stable under
    repartitioning, no shuffle)."""
    n = store.count()
    sample = store.select(F.col(vec_col).cast("array<double>").alias("_v"))
    if n > _TRAIN_SAMPLE_CAP:
        den = -(-n // _TRAIN_SAMPLE_CAP)
        sample = sample.where(F.pmod(F.xxhash64(F.col("_v")), F.lit(den)) == 0)
    return np.array([r[0] for r in sample.collect()], dtype=np.float64)


def train_pq(
    store: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
) -> np.ndarray:
    """Fit per-subspace codebooks; returns shape (m, ksub, dim/m)."""
    X = _train_sample(store, vec_col)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for i in range(m):
        sub = np.ascontiguousarray(X[:, i * dsub : (i + 1) * dsub])
        books[i] = _train_centroids(sub, nlist=ksub, seed=seed + i)
    return books


def pq_encode(
    store: DataFrame,
    books: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One distributed Arrow pass: (id, codes array<int>, recon_cos).

    `recon_cos` = cosine(original, decoded) — the per-vector
    quantization-quality figure used by the driver contract."""
    from pyspark.sql.pandas.functions import pandas_udf

    m, ksub, dsub = books.shape
    b2 = (books * books).sum(axis=2)  # (m, ksub)

    @pandas_udf("struct<codes: array<int>, recon_cos: double>")
    def _enc(v: pd.Series) -> pd.DataFrame:
        X = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        n = X.shape[0]
        codes = np.empty((n, m), dtype=np.int32)
        recon = np.empty_like(X)
        for i in range(m):
            sub = X[:, i * dsub : (i + 1) * dsub]
            d2 = (
                (sub * sub).sum(axis=1)[:, None]
                - 2.0 * (sub @ books[i].T)
                + b2[i][None, :]
            )
            c = d2.argmin(axis=1)
            codes[:, i] = c
            recon[:, i * dsub : (i + 1) * dsub] = books[i][c]
        num = (X * recon).sum(axis=1)
        den = np.linalg.norm(X, axis=1) * np.linalg.norm(recon, axis=1)
        den[den == 0.0] = 1.0
        return pd.DataFrame(
            {"codes": list(codes), "recon_cos": num / den}
        )

    enc = store.withColumn("_pq", _enc(F.col(vec_col).cast("array<double>")))
    return enc.select(
        id_col, F.col("_pq.codes").alias("codes"),
        F.col("_pq.recon_cos").alias("recon_cos"),
    )


def pq_adc_search(
    codes_df: DataFrame,
    books: np.ndarray,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: approximate squared-euclidean distance of the query to
    every CODE (no decode, no vector column scanned) via an (m × ksub)
    lookup table, then TakeOrderedAndProject."""
    from pyspark.sql.pandas.functions import pandas_udf

    m, ksub, dsub = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    # lut[i][c] = || q_sub_i - books[i][c] ||²
    lut = np.stack(
        [
            ((q[i * dsub : (i + 1) * dsub][None, :] - books[i]) ** 2).sum(axis=1)
            for i in range(m)
        ]
    )

    @pandas_udf("double")
    def _adc(codes: pd.Series) -> pd.Series:
        C = np.stack(codes.to_numpy()).astype(np.int64)  # (n, m)
        return pd.Series(lut[np.arange(m)[None, :], C].sum(axis=1))

    return (
        codes_df.withColumn("adc_d2", _adc(F.col("codes")))
        .orderBy(F.col("adc_d2").asc(), F.col(id_col).asc())
        .limit(k)
    )


def build_ivfpq_index(
    store: DataFrame,
    nlist: int = 8,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Build the IVF-PQ index ONCE for any number of searches: returns
    (index_df = (id, cell_id, codes, recon_cos), centroids = {cell:
    np.array}, books, cell_counts = {cell: n_rows}). Train/assign/
    encode each cost one pass; at scale the index_df is what you
    persist partitioned by cell_id — queries then amortize the build
    across the whole workload instead of re-quantizing per search.
    cell_counts is the per-cell manifest (one aggregate at build time)
    that lets each search derive its probed-scaled ADC re-rank budget
    driver-side in O(nprobe) — no extra Spark action per query."""
    from vector_ai_npm_spark.retrieval.ivf import build_ivf_index

    books = train_pq(store, vec_col=vec_col, m=m, ksub=ksub)
    assigned, centroids = build_ivf_index(store, vec_col, nlist=nlist)
    codes = pq_encode(store, books, vec_col=vec_col, id_col=id_col)
    index = assigned.select(id_col, "cell_id").join(codes, id_col)
    cents = {r[0]: np.asarray(r[1]) for r in centroids.collect()}
    cell_counts = {
        r.cell_id: r.n
        for r in assigned.groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return index, cents, books, cell_counts


def ivfpq_search_index(
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
    """Search a prebuilt IVF-PQ index (see ivfpq_search for the
    pipeline shape).

    Default shortlist SCALES with the probed-candidate count
    (max(4k, probed/5)): a fixed 4k shortlist silently starves the
    exact re-rank as the corpus grows — measured in the round-8 sf0.1
    sweep, recall@5 fell 0.73 → 0.47 at 10× corpus with shortlist 20,
    and recovered at a probed/5 re-rank budget — the FAISS-style
    reranking-budget rule made explicit.  The probed count comes from
    the build-time per-cell manifest (`cell_counts`) when available —
    summing nprobe dict entries on the driver — so the default costs
    no Spark action; the live count() is only the fallback for callers
    holding a bare index frame."""
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
    short = pq_adc_search(probed, books, query_vec, k=shortlist, id_col=id_col)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    w_rank = F.row_number()
    from pyspark.sql import Window

    # exact re-rank of the (≤shortlist-row) ADC survivors, then top-k via
    # orderBy+limit (TakeOrderedAndProject) BEFORE the rank window so the
    # unpartitioned window only ever sees k rows, not the shortlist
    rescored = (
        short.join(store.select(id_col, vec_col), id_col)
        .select(
            id_col,
            "cell_id",
            cosine_similarity(F.col(vec_col), qlit).alias("similarity"),
        )
        .orderBy(F.col("similarity").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return rescored.withColumn(
        "rank",
        w_rank.over(
            Window.orderBy(F.col("similarity").desc(), F.col(id_col).asc())
        ).cast("long"),
    )


def ivfpq_search(
    store: DataFrame,
    query_vec: list[float],
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    shortlist: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The full FAISS IVF-PQ pipeline, batch-shaped (build + search):

      1. IVF cell pruning — scan only the query's nprobe nearest cells
         (~nprobe/nlist of the corpus; a partition-pruned read when the
         index table is written partitioned by cell_id).
      2. ADC shortlist — rank the surviving CODES by lookup-table
         distance (8 bytes/row touched, no vectors), keep
         `shortlist` (default 4k) candidates.
      3. Exact re-rank — hydrate true vectors for the shortlist only
         and compute exact cosine top-k.

    Memory math at 100 TB: stage 2 scans m-byte codes instead of
    dim×4-byte vectors (32× here), and stage 3 touches `shortlist`
    vectors per query — the only full-precision reads in the whole
    search. Build is deterministic (seeded quantizers), so results are
    stable per fixture. For many queries over one corpus, call
    build_ivfpq_index once and ivfpq_search_index per query."""
    index, cents, books, cell_counts = build_ivfpq_index(
        store, nlist=nlist, m=m, ksub=ksub, vec_col=vec_col, id_col=id_col
    )
    return ivfpq_search_index(
        index, cents, books, store, query_vec,
        k=k, nprobe=nprobe, shortlist=shortlist,
        vec_col=vec_col, id_col=id_col, cell_counts=cell_counts,
    )

"""IVF (inverted-file) ANN: k-means coarse quantizer + cell-probed search.

The second classic batch-index shape next to LSH (retrieval.lsh), per the
north-star "Batch index build via MLlib":

  1. index build (offline): MLlib KMeans (seed-fixed) fits nlist
     centroids on the store; each vector is assigned to its nearest
     centroid → an index table (cell_id, vec_id, embedding) partitioned
     by cell_id on disk.
  2. query: compute each query's nprobe nearest centroids (a
     centroid-count-sized broadcast problem), then join queries to ONLY
     those cells — the scan shrinks by ~nlist/nprobe.
  3. exact cosine re-rank inside the probed cells, window top-k.

Recall/latency trade is (nlist, nprobe); tests assert ≥0.9 recall vs the
exact top-k on the fixture. Online serving stays out of scope
(BASELINE.json) — this is the batch query path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.vectors import cosine_similarity


def build_ivf_index(store: DataFrame, vec_col: str = "embedding",
                    nlist: int = 16, seed: int = 42):
    """Fit the coarse quantizer and return (assigned_store, centroids_df).

    assigned_store = store + cell_id; centroids_df = (cell_id, centroid)
    — at scale you'd persist assigned_store partitioned by cell_id.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = store.withColumn("_features", array_to_vector(F.col(vec_col)))
    km = KMeans(k=nlist, seed=seed, featuresCol="_features",
                predictionCol="cell_id")
    model = km.fit(vecs)
    assigned = model.transform(vecs).drop("_features")
    spark = store.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        ["cell_id", "centroid"],
    )
    return assigned, centroids


def ivf_similarity_join(queries: DataFrame, store: DataFrame, k: int = 5,
                        nlist: int = 16, nprobe: int = 4,
                        q_id: str = "q_vec_id", q_vec: str = "q_embedding",
                        s_vec: str = "embedding",
                        tiebreak: str = "vec_id") -> DataFrame:
    """Same output contract as search.similarity_join, scanning only the
    nprobe nearest cells per query instead of the whole store."""
    assigned, centroids = build_ivf_index(store, s_vec, nlist=nlist)

    # rank centroids per query (queries × nlist is tiny; broadcast NLJ)
    cw = Window.partitionBy(q_id).orderBy(
        F.col("c_sim").desc(), F.col("cell_id").asc()
    )
    probed = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn(
            "c_sim", cosine_similarity(F.col(q_vec), F.col("centroid"))
        )
        .withColumn("c_rank", F.row_number().over(cw))
        .where(F.col("c_rank") <= nprobe)
        .select(q_id, q_vec, "cell_id")
    )

    # probe: equi-join on cell_id — the store side shuffles on cell_id
    # once (or not at all when pre-partitioned by cell_id on disk)
    sim = cosine_similarity(F.col(s_vec), F.col(q_vec)).alias("similarity")
    w = Window.partitionBy(q_id).orderBy(
        F.col("similarity").desc(), F.col(tiebreak).asc()
    )
    return (
        assigned.join(probed, "cell_id")
        .select(q_id, tiebreak, sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )

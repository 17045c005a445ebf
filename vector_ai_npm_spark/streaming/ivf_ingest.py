"""Wave 29: streaming ingest into the incremental IVF store.

`stream_ivf_append` — the streaming face of `vector_store_ivf_append`
(wave 28) and the closing arc of the index-maintenance story: vector
batches arrive as a REAL Structured Streaming source (one file per
trigger, availableNow — the stream_foreach_upsert harness), and each
micro-batch routes through the FROZEN coarse quantizer into the
existing cell directories via foreachBatch.  This is how a production
embedding pipeline keeps its ANN index fresh: embed (embed_incremental)
→ stream-append (this face) → drift audit (embedding_centroid_drift)
→ rebuild only when the audit alarms.

Contract pinned (all deterministic — seeded quantizer, fixed split):
count conservation through N real micro-batches (store rows = base +
streamed EXACTLY — foreachBatch's at-least-once is made genuinely
idempotent by the batch-keyed layout: each epochId overwrites its own
`appends/batch=<id>` subtree, so a crash-replay re-delivery converges
to the same rows; test_wave29 pins it with an explicit re-delivery),
a STREAMED vector's rank-1 self-search through the partition-pruned
path, and the `ivf_store_recall` ≥3/5 overlap floor vs the exact
ranking.

Scale shape: per micro-batch work is one Arrow-batched centroid
assignment + an append-mode partitioned write of THAT batch only; the
base store is never rewritten, searches prune to nprobe cells
regardless of how many appends have accumulated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_N_STREAM_FILES = 3


@query(
    "stream_ivf_append",
    oracle=f"""
    SELECT CAST(COUNT(*) FILTER (WHERE vec_id % 3 <> 0) AS BIGINT)
             AS n_base,
           CAST(COUNT(*) FILTER (WHERE vec_id % 3 = 0) AS BIGINT)
             AS n_streamed,
           CAST(COUNT(*) AS BIGINT) AS n_store,
           CAST({_N_STREAM_FILES} AS BIGINT) AS n_input_files,
           TRUE AS self_rank1_ok,
           TRUE AS recall_ok
    FROM embeddings
    """,
)
def stream_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming IVF ingest — see module docstring.  The streamed
    third arrives as _N_STREAM_FILES (3) files tailed one per trigger,
    so the append path runs 3 REAL incremental merges before the
    search."""
    import glob
    import tempfile

    from vector_ai_npm_spark.functions.vectors import cosine_similarity
    from vector_ai_npm_spark.retrieval.store import (
        append_ivf_store_batch,
        persist_ivf_store,
        read_ivf_cells,
        search_ivf_store,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 3 != 0)
    batch = emb.where(F.col("vec_id") % 3 == 0)
    root = tempfile.mkdtemp(prefix="ivf_stream_")
    store_dir, input_dir, ckpt = (
        f"{root}/store", f"{root}/in", f"{root}/ckpt",
    )
    persist_ivf_store(base, store_dir, nlist=8)
    batch.repartition(_N_STREAM_FILES).write.parquet(input_dir)
    n_files = len(glob.glob(f"{input_dir}/part-*.parquet"))
    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    # batch-keyed append: each epochId owns appends/batch=<id> in
    # overwrite mode, so an at-least-once foreachBatch replay
    # overwrites itself instead of duplicating rows (exactly-once
    # effective semantics — pinned by test_wave29's replay test)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, i: append_ivf_store_batch(b, store_dir, i)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stored = read_ivf_cells(spark, store_dir)
    qvec = list(
        emb.where(F.col("vec_id") == 42).select("embedding").first()[0]
    )
    # corpus-scaled probe budget (r11 sf1 catch — see store.scaled_nprobe)
    from vector_ai_npm_spark.retrieval.store import scaled_nprobe

    hits = search_ivf_store(
        spark, store_dir, qvec, k=5,
        nprobe=scaled_nprobe(emb.count(), nlist=8),
    )
    qcol = F.lit(qvec).cast("array<float>")
    exact = (
        emb.select(
            "vec_id",
            cosine_similarity(F.col("embedding"), qcol).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(5)
        .select(F.col("vec_id").alias("e_vec_id"))
    )
    overlap = hits.join(exact, hits.vec_id == F.col("e_vec_id")).agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    self_ok = hits.where(
        (F.col("rank") == 1)
        & (F.col("vec_id") == 42)
        & (F.col("similarity") >= 0.999999)
    ).agg(F.count(F.lit(1)).alias("n_self"))
    counts = (
        base.agg(F.count(F.lit(1)).cast("bigint").alias("n_base"))
        .crossJoin(
            F.broadcast(
                batch.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_streamed")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                stored.agg(F.count(F.lit(1)).cast("bigint").alias("n_store"))
            )
        )
    )
    return (
        counts.crossJoin(F.broadcast(self_ok))
        .crossJoin(F.broadcast(overlap))
        .select(
            "n_base", "n_streamed", "n_store",
            F.lit(n_files).cast("bigint").alias("n_input_files"),
            (F.col("n_self") == 1).alias("self_rank1_ok"),
            (F.col("n_overlap") >= 3).alias("recall_ok"),
        )
    )

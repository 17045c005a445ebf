"""Wave 41: IVF store compaction as a driver-checked contract.

`vector_store_ivf_compact` — the maintenance close of the
append lifecycle (wave 28 batch append → wave 29 streaming append →
THIS: fold the accumulated `appends/batch=*` subtrees back into the
base cell layout).  Small per-batch files are how streaming appends
keep write cost bounded, but read cost grows with file COUNT even
though partition pruning bounds bytes — compaction is the standard
remedy (every table format ships one; this is the hand-rolled-layout
equivalent with a dir-existence crash protocol,
retrieval/store.py::compact_ivf_appends).

Contract pinned: row-count conservation through build → 2 streaming-
style batch appends → compact (store = base + appended EXACTLY, no
row lost or doubled), the appends subtree GONE after compaction, the
file count not larger than before, an APPENDED vector's rank-1
self-search through the partition-pruned path surviving compaction,
and the compaction no-op on a second run.

Scale shape: compaction reads base ∪ appends once, dedups on the id
key, and rewrites cell-partitioned — one shuffle, amortized over
every read after it; crash windows converge (crash-simulation tests
in tests/test_wave29.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


@query(
    "vector_store_ivf_compact",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE vec_id % 3 <> 0) AS BIGINT)
             AS n_base,
           CAST(COUNT(*) FILTER (WHERE vec_id % 3 = 0) AS BIGINT)
             AS n_appended,
           CAST(COUNT(*) AS BIGINT) AS n_store,
           TRUE AS appends_cleared,
           TRUE AS self_rank1_ok,
           TRUE AS second_compact_noop
    FROM embeddings
    """,
)
def vector_store_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction contract — see module docstring."""
    import glob
    import os
    import tempfile

    from vector_ai_npm_spark.retrieval.store import (
        append_ivf_store_batch,
        compact_ivf_appends,
        persist_ivf_store,
        read_ivf_cells,
        search_ivf_store,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 3 != 0)
    b0 = emb.where(F.col("vec_id") % 6 == 0)
    b1 = emb.where(F.col("vec_id") % 6 == 3)
    store_dir = tempfile.mkdtemp(prefix="ivf_compact_") + "/store"
    persist_ivf_store(base, store_dir, nlist=8)
    append_ivf_store_batch(b0, store_dir, 0)
    append_ivf_store_batch(b1, store_dir, 1)
    n_files_before = len(
        glob.glob(f"{store_dir}/cells/cell_id=*/*.parquet")
        + glob.glob(f"{store_dir}/appends/batch=*/cell_id=*/*.parquet")
    )
    n_folded = compact_ivf_appends(spark, store_dir)
    n_files_after = len(
        glob.glob(f"{store_dir}/cells/cell_id=*/*.parquet")
    )
    appends_cleared = (
        not os.path.isdir(f"{store_dir}/appends")
        and n_files_after <= n_files_before
        and n_folded > 0
    )
    second_noop = compact_ivf_appends(spark, store_dir) == 0
    stored = read_ivf_cells(spark, store_dir)
    qvec = list(
        emb.where(F.col("vec_id") == 42).select("embedding").first()[0]
    )
    hits = search_ivf_store(spark, store_dir, qvec, k=5, nprobe=4)
    self_ok = hits.where(
        (F.col("rank") == 1)
        & (F.col("vec_id") == 42)
        & (F.col("similarity") >= 0.999999)
    ).agg((F.count(F.lit(1)) == 1).alias("ok"))
    counts = (
        base.agg(F.count(F.lit(1)).cast("bigint").alias("n_base"))
        .crossJoin(
            F.broadcast(
                b0.unionByName(b1).agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_appended")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                stored.agg(F.count(F.lit(1)).cast("bigint").alias("n_store"))
            )
        )
    )
    return counts.crossJoin(F.broadcast(self_ok)).select(
        "n_base",
        "n_appended",
        "n_store",
        F.lit(bool(appends_cleared)).alias("appends_cleared"),
        F.col("ok").alias("self_rank1_ok"),
        F.lit(bool(second_noop)).alias("second_compact_noop"),
    )

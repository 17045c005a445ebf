"""Wave-29: streaming IVF ingest — multi-batch reality check."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


def test_stream_ivf_append_runs_real_micro_batches(
    spark, sf_oracle, tmp_path, monkeypatch
):
    """Instrument append_ivf_store to count foreachBatch invocations:
    the availableNow run must append one micro-batch per input file
    (a single-batch run would hide incremental-merge bugs)."""
    import vector_ai_npm_spark.retrieval.store as store_mod
    import vector_ai_npm_spark.streaming.ivf_ingest as mod

    calls = []
    real_append = store_mod.append_ivf_store_batch

    def counting_append(new_rows, store_dir, batch_id, vec_col="embedding"):
        calls.append(new_rows.count())
        return real_append(new_rows, store_dir, batch_id, vec_col=vec_col)

    # the query imports append_ivf_store_batch from retrieval.store at
    # call time inside the function body, so patch the source module
    monkeypatch.setattr(store_mod, "append_ivf_store_batch", counting_append)
    got = registry.run("stream_ivf_append", spark, sf_oracle).collect()[0]
    assert len(calls) == got.n_input_files == 3
    assert sum(calls) == got.n_streamed
    assert got.n_store == got.n_base + got.n_streamed
    assert got.self_rank1_ok and got.recall_ok


def test_batch_keyed_append_replay_is_idempotent(spark, sf_oracle, tmp_path):
    """Crash-replay simulation: foreachBatch is at-least-once, so a
    crash between the parquet write and the checkpoint commit
    re-delivers the same epochId.  Deliver batch 1 TWICE through
    append_ivf_store_batch and assert the store's logical content is
    identical to a single delivery — row multiset (vec_id, cell_id)
    unchanged, no duplicates, search results unchanged."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.retrieval.store import (
        append_ivf_store_batch,
        persist_ivf_store,
        read_ivf_cells,
        search_ivf_store,
    )

    emb = load_table(spark, sf_oracle, "embeddings")
    base = emb.where(F.col("vec_id") % 3 != 0)
    b0 = emb.where(F.col("vec_id") % 6 == 0)
    b1 = emb.where((F.col("vec_id") % 6 == 3))
    store_dir = str(tmp_path / "store")
    persist_ivf_store(base, store_dir, nlist=8)
    append_ivf_store_batch(b0, store_dir, 0)
    append_ivf_store_batch(b1, store_dir, 1)

    def snapshot():
        return sorted(
            (r.vec_id, r.cell_id)
            for r in read_ivf_cells(spark, store_dir)
            .select("vec_id", "cell_id")
            .collect()
        )

    qvec = list(
        emb.where(F.col("vec_id") == 42).select("embedding").first()[0]
    )

    def hits():
        return [
            (r.vec_id, r.rank)
            for r in search_ivf_store(
                spark, store_dir, qvec, k=5, nprobe=4
            ).collect()
        ]

    before, hits_before = snapshot(), hits()
    append_ivf_store_batch(b1, store_dir, 1)  # the replay
    after, hits_after = snapshot(), hits()
    assert after == before
    assert len(after) == len(set(after)) == base.count() + b0.count() + b1.count()
    assert hits_after == hits_before

    # compaction folds the appends into base cells — same logical
    # content, same search results, appends subtree gone
    import glob
    import os

    from vector_ai_npm_spark.retrieval.store import compact_ivf_appends

    n = compact_ivf_appends(spark, store_dir)
    assert n == b0.count() + b1.count()
    assert not os.path.isdir(f"{store_dir}/appends")
    assert snapshot() == before
    assert hits() == hits_before
    # second compaction is a no-op
    assert compact_ivf_appends(spark, store_dir) == 0
    # base layout stays cell-partitioned (pruning still applies)
    assert glob.glob(f"{store_dir}/cells/cell_id=*/")


def test_streamed_split_covers_query_vector(spark, sf_oracle):
    """The contract's rank-1 probe (vec_id 42) must be in the STREAMED
    partition — otherwise the self-search would only exercise the base
    store and the append visibility claim would be vacuous."""
    emb = load_table(spark, sf_oracle, "embeddings")
    assert emb.where((F.col("vec_id") == 42)).count() == 1
    assert 42 % 3 == 0  # streamed side by the fixture split


def test_compaction_crash_states_converge(spark, sf_oracle, tmp_path):
    """Simulate the two compaction crash windows and assert the
    dir-existence recovery protocol keeps reads exact:

      (a) crash mid-swap (cells renamed away, merged not yet
          published) → the reader restores the pre-compact layout;
      (b) crash after publish but before appends retirement → cells
          already contains the appended rows; the reader must IGNORE
          appends (no double count) and a compaction re-run converges.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    from vector_ai_npm_spark.retrieval.store import (
        append_ivf_store_batch,
        compact_ivf_appends,
        persist_ivf_store,
        read_ivf_cells,
    )

    emb = load_table(spark, sf_oracle, "embeddings")
    base = emb.where(F.col("vec_id") % 3 != 0)
    batch = emb.where(F.col("vec_id") % 3 == 0)
    store_dir = str(tmp_path / "store")
    persist_ivf_store(base, store_dir, nlist=8)
    append_ivf_store_batch(batch, store_dir, 0)

    def snapshot():
        return sorted(
            r.vec_id
            for r in read_ivf_cells(spark, store_dir)
            .select("vec_id")
            .collect()
        )

    want = snapshot()
    assert len(want) == emb.count()

    # --- (a) crash mid-swap: cells renamed away, nothing published --
    os.rename(f"{store_dir}/cells", f"{store_dir}/cells__pre_compact")
    assert snapshot() == want  # reader restored the layout
    assert os.path.isdir(f"{store_dir}/cells")
    assert not os.path.isdir(f"{store_dir}/cells__pre_compact")

    # --- (b) crash after publish, appends not retired ---------------
    merged = read_ivf_cells(spark, store_dir).dropDuplicates(["vec_id"])
    staging = f"{store_dir}/cells__staging_test"
    (
        merged.repartition("cell_id")
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(staging)
    )
    os.rename(f"{store_dir}/cells", f"{store_dir}/cells__pre_compact")
    os.rename(staging, f"{store_dir}/cells")
    # cells is merged; appends still present; pre marker present
    assert os.path.isdir(f"{store_dir}/appends")
    assert snapshot() == want  # appends ignored — no double count
    # re-run compaction from the crashed state: converges + cleans up
    n = compact_ivf_appends(spark, store_dir)
    assert n == batch.count()
    assert snapshot() == want
    assert not os.path.isdir(f"{store_dir}/appends")
    assert not os.path.isdir(f"{store_dir}/cells__pre_compact")
    assert not os.path.isdir(f"{store_dir}/appends__folded")
    shutil.rmtree(store_dir)

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
    real_append = store_mod.append_ivf_store

    def counting_append(new_rows, store_dir, vec_col="embedding"):
        calls.append(new_rows.count())
        return real_append(new_rows, store_dir, vec_col=vec_col)

    # the query imports append_ivf_store from retrieval.store at call
    # time inside the function body, so patch the source module
    monkeypatch.setattr(store_mod, "append_ivf_store", counting_append)
    got = registry.run("stream_ivf_append", spark, sf_oracle).collect()[0]
    assert len(calls) == got.n_input_files == 3
    assert sum(calls) == got.n_streamed
    assert got.n_store == got.n_base + got.n_streamed
    assert got.self_rank1_ok and got.recall_ok


def test_streamed_split_covers_query_vector(spark, sf_oracle):
    """The contract's rank-1 probe (vec_id 42) must be in the STREAMED
    partition — otherwise the self-search would only exercise the base
    store and the append visibility claim would be vacuous."""
    emb = load_table(spark, sf_oracle, "embeddings")
    assert emb.where((F.col("vec_id") == 42)).count() == 1
    assert 42 % 3 == 0  # streamed side by the fixture split

"""Wave 44: IVF store append-during-compact arbitration + marker
hygiene (round-10 verdict item 4 and the round-9 ADVICE items).

The round-9 protocol covered crash interleavings of ONE maintenance
writer.  These tests pin the remaining interleavings:

  * a streaming append landing INSIDE compaction's stage→publish
    window survives (pinned fold set + per-batch retirement — the
    whole-dir rename would have swept it into the retirement rmtree);
  * a stale ``cells__pre_compact`` marker (crash between retiring the
    folded batches and clearing the marker) no longer shadows fresh
    appends — readers dedup instead of trusting the marker, and the
    no-appends compaction early-exit clears leftovers;
  * a stream replay recreating an ALREADY-FOLDED batch subtree does
    not double-count on read;
  * an append that re-ingests an existing vec_id with a DIFFERENT
    embedding makes compaction raise instead of keeping an arbitrary
    version (the frozen-centroid exact-replay precondition, asserted).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.retrieval import store as ivf_store
from vector_ai_npm_spark.retrieval.store import (
    append_ivf_store_batch,
    compact_ivf_appends,
    persist_ivf_store,
    read_ivf_cells,
)


def _ids(spark, store_dir):
    return sorted(
        r.vec_id
        for r in read_ivf_cells(spark, store_dir).select("vec_id").collect()
    )


@pytest.fixture()
def store(spark, sf_oracle, tmp_path):
    emb = load_table(spark, sf_oracle, "embeddings")
    base = emb.where(F.col("vec_id") % 3 != 0)
    store_dir = str(tmp_path / "store")
    persist_ivf_store(base, store_dir, nlist=8)
    return emb, store_dir


def test_append_during_compact_survives(spark, store):
    """A batch landing between compaction's staging write and its
    publish swap is NOT swept into retirement: reads converge on
    base ∪ folded ∪ concurrent exactly once, and the next compaction
    folds the straggler."""
    emb, store_dir = store
    folded_batch = emb.where(F.col("vec_id") % 6 == 0)
    concurrent = emb.where(F.col("vec_id") % 6 == 3)
    append_ivf_store_batch(folded_batch, store_dir, 0)

    def land_concurrent():
        append_ivf_store_batch(concurrent, store_dir, 1)

    ivf_store._test_after_staging = land_concurrent
    try:
        n = compact_ivf_appends(spark, store_dir)
    finally:
        ivf_store._test_after_staging = None
    assert n == folded_batch.count()
    # the concurrent batch's subtree survived retirement…
    assert glob.glob(f"{store_dir}/appends/batch=1/cell_id=*/*.parquet")
    assert not glob.glob(f"{store_dir}/appends/batch=0")
    # …and reads see every vector exactly once
    assert _ids(spark, store_dir) == sorted(
        r.vec_id for r in emb.select("vec_id").collect()
    )
    # the next compaction folds the straggler and empties appends
    assert compact_ivf_appends(spark, store_dir) == concurrent.count()
    assert not os.path.isdir(f"{store_dir}/appends")
    assert _ids(spark, store_dir) == sorted(
        r.vec_id for r in emb.select("vec_id").collect()
    )


def test_stale_pre_compact_marker_does_not_shadow_fresh_appends(
    spark, store
):
    """Crash window: appends retired, pre marker NOT yet cleared.
    Fresh appends streamed afterwards must be visible to readers, and
    a no-appends compaction run must clear the stale marker."""
    emb, store_dir = store
    batch = emb.where(F.col("vec_id") % 3 == 0)
    append_ivf_store_batch(batch, store_dir, 0)
    assert compact_ivf_appends(spark, store_dir) == batch.count()
    # simulate the stale-marker crash state: cells == merged layout,
    # a pre marker lingering, appends gone
    os.makedirs(f"{store_dir}/cells__pre_compact")
    fresh = emb.where(F.col("vec_id") % 3 == 1).withColumn(
        "vec_id", F.col("vec_id") + 10_000_000
    )
    append_ivf_store_batch(fresh, store_dir, 7)
    want = sorted(
        [r.vec_id for r in emb.select("vec_id").collect()]
        + [r.vec_id for r in fresh.select("vec_id").collect()]
    )
    # the old ignore-appends-while-marked rule silently dropped `fresh`
    assert _ids(spark, store_dir) == want
    # fold the fresh batch, then the no-op run clears the stale marker
    assert compact_ivf_appends(spark, store_dir) == fresh.count()
    assert compact_ivf_appends(spark, store_dir) == 0
    assert not os.path.isdir(f"{store_dir}/cells__pre_compact")
    assert _ids(spark, store_dir) == want


def test_compaction_self_recovers_mid_swap_crash(spark, store):
    """A compaction re-run from the mid-swap crash state (cells
    renamed away, merged not published) restores the layout itself —
    no read has to happen first."""
    emb, store_dir = store
    batch = emb.where(F.col("vec_id") % 3 == 0)
    append_ivf_store_batch(batch, store_dir, 0)
    os.rename(f"{store_dir}/cells", f"{store_dir}/cells__pre_compact")
    assert compact_ivf_appends(spark, store_dir) == batch.count()
    assert not os.path.isdir(f"{store_dir}/cells__pre_compact")
    assert _ids(spark, store_dir) == sorted(
        r.vec_id for r in emb.select("vec_id").collect()
    )


def test_replayed_folded_batch_does_not_double_count(spark, store):
    """A stream replay that recreates an already-folded batch subtree
    (crash after compaction, before the stream checkpoint committed)
    reads exactly once — the (cell_id, vec_id) dedup converges it."""
    emb, store_dir = store
    batch = emb.where(F.col("vec_id") % 3 == 0)
    append_ivf_store_batch(batch, store_dir, 0)
    assert compact_ivf_appends(spark, store_dir) == batch.count()
    append_ivf_store_batch(batch, store_dir, 0)  # the replay
    want = sorted(r.vec_id for r in emb.select("vec_id").collect())
    assert _ids(spark, store_dir) == want
    # the replayed rows are exact duplicates → compaction converges
    assert compact_ivf_appends(spark, store_dir) == batch.count()
    assert _ids(spark, store_dir) == want


def test_dedup_read_keeps_partition_pruning(spark, store):
    """The (cell_id, vec_id) dedup added to the appends-present read
    path must not break nprobe pruning: cell_id is a dedup key, so the
    probe predicate pushes through the Deduplicate into BOTH legs'
    PartitionFilters."""
    emb, store_dir = store
    batch = emb.where(F.col("vec_id") % 3 == 0)
    append_ivf_store_batch(batch, store_dir, 0)
    probed = read_ivf_cells(spark, store_dir).where(
        F.col("cell_id").isin(0, 1)
    )
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    plan = probed._jdf.queryExecution().executedPlan().toString()
    scans = [
        seg
        for seg in plan.split("FileScan parquet")[1:]
        if "PartitionFilters" in seg
    ]
    assert len(scans) >= 2, plan  # base leg + appends leg
    for seg in scans:
        pf = seg.split("PartitionFilters: [")[1].split("]")[0]
        assert "cell_id" in pf, plan


def test_update_conflict_raises_not_arbitrary(spark, store):
    """Re-ingesting an existing vec_id with a DIFFERENT embedding is
    an update this layout does not arbitrate — compaction must raise,
    not nondeterministically keep one version."""
    emb, store_dir = store
    mutated = (
        emb.where(F.col("vec_id") % 3 != 0)
        .limit(5)
        .withColumn(
            "embedding",
            F.transform(
                "embedding", lambda x: (x + F.lit(1.0)).cast("float")
            ),
        )
    )
    append_ivf_store_batch(mutated, store_dir, 0)
    with pytest.raises(ValueError, match="different row"):
        compact_ivf_appends(spark, store_dir)

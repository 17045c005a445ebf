"""Writer lease + owner pin (io/lease.py): interleaved writers must
converge or raise — silent interleaving is the only wrong answer
(r10 verdict item 8)."""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from vector_ai_npm_spark.io.lease import (
    StoreWriterConflict,
    claim_store,
    writer_lease,
)


def test_writer_lease_excludes_and_releases(tmp_path):
    path = str(tmp_path / "table")
    with writer_lease(path, op="a"):
        assert os.path.exists(f"{path}.__writer_lock")
        with pytest.raises(StoreWriterConflict, match="another writer"):
            with writer_lease(path, op="b", timeout_s=0.2):
                pass
    assert not os.path.exists(f"{path}.__writer_lock")
    # released: immediately re-acquirable
    with writer_lease(path, op="c", timeout_s=0.2):
        pass


def test_writer_lease_waits_for_release(tmp_path):
    path = str(tmp_path / "table")
    order = []

    def holder():
        with writer_lease(path, op="first"):
            order.append("first-in")
            time.sleep(0.4)
            order.append("first-out")

    t = threading.Thread(target=holder)
    t.start()
    time.sleep(0.1)  # let the thread acquire
    with writer_lease(path, op="second", timeout_s=5.0):
        order.append("second-in")
    t.join()
    assert order == ["first-in", "first-out", "second-in"]


def test_writer_lease_breaks_dead_holder(tmp_path):
    path = str(tmp_path / "table")
    lock = f"{path}.__writer_lock"
    # a pid that cannot exist (> kernel pid_max)
    with open(lock, "w") as fh:
        json.dump({"pid": 2**30, "op": "crashed", "ts": time.time()}, fh)
    with writer_lease(path, op="recover", timeout_s=1.0):
        pass  # acquired despite the leftover lock


def test_writer_lease_breaks_unreadable_lock(tmp_path):
    path = str(tmp_path / "table")
    with open(f"{path}.__writer_lock", "w") as fh:
        fh.write("not json")
    with writer_lease(path, op="recover", timeout_s=1.0):
        pass


def test_interleaved_engine_writers_converge(spark, tmp_path):
    """The verdict's interleaved-writer test: a delete and an append
    racing on one table must serialize through the lease — the final
    store contains the append's rows AND reflects the delete, with
    nothing silently swept."""
    from vector_ai_npm_spark.engine import EngineConfig, VectorEngine

    eng = VectorEngine(
        spark,
        EngineConfig(chunk_size=120, chunk_overlap=30,
                     store_path=str(tmp_path)),
    )
    docs_a = spark.createDataFrame(
        [(1, "## Context\nalpha rows for the delete target"),
         (2, "## Context\nbeta rows that must survive")],
        ["doc_id", "mdx"],
    )
    eng.ingest_data(docs_a, db_table="docs")

    errs: list[Exception] = []

    def deleter():
        try:
            eng.delete_data([1], db_table="docs")
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    t = threading.Thread(target=deleter)
    t.start()
    # race a fresh append against the in-flight delete; the lease
    # serializes them in whichever order wins
    docs_b = spark.createDataFrame(
        [(3, "## Context\ngamma rows appended mid-delete")],
        ["doc_id", "mdx"],
    )
    eng.ingest_data(docs_b, db_table="docs")
    t.join()
    assert not errs, errs

    store = spark.read.parquet(f"{tmp_path}/docs")
    ids = {r.doc_id for r in store.select("doc_id").distinct().collect()}
    assert 2 in ids, "pre-existing rows vanished"
    assert 3 in ids, "append was silently swept by the delete swap"
    assert 1 not in ids, "delete did not apply"
    assert not os.path.exists(f"{tmp_path}/docs.__writer_lock")


def test_claim_store_pins_owner(tmp_path):
    store = str(tmp_path / "store")
    claim_store(store, "ckpt-A")
    claim_store(store, "ckpt-A")  # restart path: idempotent
    with pytest.raises(StoreWriterConflict, match="owned by stream"):
        claim_store(store, "ckpt-B")


def test_second_stream_different_checkpoint_raises(spark, tmp_path):
    """A second upsert stream pointed at an existing store with a NEW
    checkpoint would publish colliding version numbers — it must raise
    before writing a byte; a restart on the original checkpoint is the
    supported path."""
    from vector_ai_npm_spark.streaming.sinks import (
        final_totals,
        run_upsert_stream,
    )

    ind = str(tmp_path / "in")
    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(1, 10.0), (2, 5.0)], "user_id long, value double"
    ).repartition(2).write.parquet(ind)
    run_upsert_stream(spark, ind, store, str(tmp_path / "ckpt1"))
    before = {
        (r.user_id, r.total_value)
        for r in final_totals(spark, store).collect()
    }
    with pytest.raises(StoreWriterConflict, match="owned by stream"):
        run_upsert_stream(spark, ind, store, str(tmp_path / "ckpt2"))
    # original checkpoint restarts fine and the totals are untouched
    run_upsert_stream(spark, ind, store, str(tmp_path / "ckpt1"))
    after = {
        (r.user_id, r.total_value)
        for r in final_totals(spark, store).collect()
    }
    assert after == before


# --------------------------------------------------------------------------
# r12: pid-liveness-first breaking, self-check unlink, atomic owner marker
# --------------------------------------------------------------------------


def test_live_holder_not_broken_by_age(tmp_path):
    """A legitimate writer whose operation outlives the staleness
    horizon keeps its lock: the waiter times out instead of breaking in
    and interleaving (the ts horizon is only a pid-reuse guard now)."""
    import json
    import os
    import time

    import pytest

    from vector_ai_npm_spark.io.lease import (
        StoreWriterConflict,
        writer_lease,
        _lock_path,
    )

    store = str(tmp_path / "s")
    with writer_lease(store, op="slow"):
        # age the lock far past stale_after_s while the holder (this
        # process) is alive
        lock = _lock_path(store)
        meta = json.load(open(lock))
        meta["ts"] = time.time() - 10_000.0
        with open(lock, "w") as fh:
            json.dump(meta, fh)
        with pytest.raises(StoreWriterConflict):
            with writer_lease(store, op="usurper", timeout_s=0.3,
                              stale_after_s=1.0):
                pass
    assert not os.path.exists(_lock_path(store))


def test_finally_does_not_unlink_foreign_lock(tmp_path):
    """If the lock file no longer records our pid when we exit, leave
    it alone — unlinking would evict the new holder."""
    import json
    import os

    from vector_ai_npm_spark.io.lease import writer_lease, _lock_path

    store = str(tmp_path / "s")
    lock = _lock_path(store)
    with writer_lease(store, op="w1"):
        # simulate a (wrong or right) breaker re-acquiring under us
        with open(lock, "w") as fh:
            json.dump({"pid": 1, "op": "w2", "ts": 0}, fh)
    assert os.path.exists(lock)  # foreign lock survived our finally
    os.unlink(lock)


def test_claim_store_empty_marker_treated_unclaimed(tmp_path):
    """A legacy crash between create and write left an empty __owner;
    the next claim rewrites it instead of wedging the store forever."""
    import os

    from vector_ai_npm_spark.io.lease import claim_store

    store = str(tmp_path / "s")
    os.makedirs(store)
    open(os.path.join(store, "__owner"), "w").close()  # empty marker
    claim_store(store, "stream-a")  # must NOT raise
    assert open(os.path.join(store, "__owner")).read() == "stream-a"
    claim_store(store, "stream-a")  # restart path still fine

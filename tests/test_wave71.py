"""Wave 71: manifest-CAS table log — N-writer races, time travel."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.tablelog import (
    CommitConflict,
    append_table,
    read_table,
    replace_table,
    snapshot,
    table_history,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"), (F.col("id") * 2.0).alias("value")
    )


def test_append_read_history(spark, tmp_path):
    t = str(tmp_path / "t")
    assert read_table(spark, t) is None
    assert append_table(_df(spark, 0, 10), t) == 0
    assert append_table(_df(spark, 10, 25), t) == 1
    got = read_table(spark, t)
    assert got.count() == 25
    hist = table_history(t)
    assert [h["version"] for h in hist] == [0, 1]
    assert all(h["n_removes"] == 0 for h in hist)


def test_time_travel_reads_each_prefix(spark, tmp_path):
    t = str(tmp_path / "t")
    append_table(_df(spark, 0, 5), t)
    append_table(_df(spark, 5, 9), t)
    append_table(_df(spark, 9, 12), t)
    assert read_table(spark, t, version=0).count() == 5
    assert read_table(spark, t, version=1).count() == 9
    assert read_table(spark, t, version=2).count() == 12
    with pytest.raises(ValueError, match="no committed version"):
        read_table(spark, t, version=7)


def test_replace_compacts_and_preserves_content(spark, tmp_path):
    t = str(tmp_path / "t")
    append_table(_df(spark, 0, 8).repartition(4), t)
    append_table(_df(spark, 8, 20).repartition(4), t)
    v, live_before = snapshot(t)
    replace_table(read_table(spark, t).coalesce(1), t, v)
    v2, live_after = snapshot(t)
    assert v2 == v + 1
    assert len(live_after) == 1 and set(live_after) != set(live_before)
    got = {r.event_id for r in read_table(spark, t).collect()}
    assert got == set(range(20))
    # time travel still sees the pre-compaction snapshot byte-exactly
    assert read_table(spark, t, version=v).count() == 20


def test_replace_conflicts_with_interleaved_append(spark, tmp_path):
    """The verdict's interleaving, solved by CAS instead of a lease:
    an append lands between the rewrite's snapshot and its commit —
    the replace must RAISE, never silently drop the appended rows."""
    t = str(tmp_path / "t")
    append_table(_df(spark, 0, 10), t)
    v, _ = snapshot(t)
    compacted = read_table(spark, t).coalesce(1)
    append_table(_df(spark, 10, 13), t)  # interleaved writer
    with pytest.raises(CommitConflict, match="version"):
        replace_table(compacted, t, v)
    # nothing was lost
    assert read_table(spark, t).count() == 13


def test_concurrent_appends_both_land(spark, tmp_path):
    t = str(tmp_path / "t")
    append_table(_df(spark, 0, 5), t)
    errs = []

    def worker(lo, hi):
        try:
            append_table(_df(spark, lo, hi), t)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=worker, args=(100 * i, 100 * i + 10))
        for i in range(1, 5)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    assert read_table(spark, t).count() == 5 + 4 * 10
    assert [h["version"] for h in table_history(t)] == [0, 1, 2, 3, 4]


def test_store_manifest_acid_parity(spark, sf_smoke):
    from tests.oracle_harness import compare
    from vector_ai_npm_spark.registry import all_oracles

    problems = compare(
        spark, "store_manifest_acid",
        all_oracles()["store_manifest_acid"], sf_smoke,
    )
    assert not problems, problems


# --------------------------------------------------------------------------
# r12: checkpoints, atomic publish, staged-file cleanup
# --------------------------------------------------------------------------


def test_checkpoint_written_and_snapshot_matches_fold(spark, tmp_path):
    """After crossing CHECKPOINT_EVERY commits a checkpoint record
    exists, snapshot() resolves through it, and time travel below the
    checkpoint still folds the raw prefix."""
    import os

    from vector_ai_npm_spark.io import tablelog

    t = str(tmp_path / "t")
    for i in range(tablelog.CHECKPOINT_EVERY + 3):
        append_table(_df(spark, i * 5, i * 5 + 5), t)
    cp = tablelog._checkpoint_path(t, tablelog.CHECKPOINT_EVERY)
    assert os.path.exists(cp)
    v, live = snapshot(t)
    assert v == tablelog.CHECKPOINT_EVERY + 2
    assert read_table(spark, t).count() == (tablelog.CHECKPOINT_EVERY + 3) * 5
    # as-of below the checkpoint: raw fold, unaffected by the record
    assert read_table(spark, t, version=3).count() == 20
    # as-of above it: resolved via the checkpoint + suffix fold
    above = tablelog.CHECKPOINT_EVERY + 1
    assert read_table(spark, t, version=above).count() == (above + 1) * 5


def test_corrupt_checkpoint_is_ignored(spark, tmp_path):
    """A checkpoint is pure optimization: garbage in the file must not
    change what snapshot() returns (the commit records are truth)."""
    from vector_ai_npm_spark.io import tablelog

    t = str(tmp_path / "t")
    for i in range(tablelog.CHECKPOINT_EVERY + 1):
        append_table(_df(spark, i * 3, i * 3 + 3), t)
    cp = tablelog._checkpoint_path(t, tablelog.CHECKPOINT_EVERY)
    with open(cp, "w") as fh:
        fh.write("{not json")
    assert read_table(spark, t).count() == (tablelog.CHECKPOINT_EVERY + 1) * 3


def test_unreadable_newest_record_is_in_flight(spark, tmp_path):
    """A legacy writer crashing mid-publish left an empty newest
    version file; readers treat it as in-flight instead of crashing."""
    from vector_ai_npm_spark.io import tablelog

    t = str(tmp_path / "t")
    append_table(_df(spark, 0, 10), t)
    append_table(_df(spark, 10, 15), t)
    # simulate the pre-atomic failure mode: an EMPTY version file
    open(tablelog._version_path(t, 2), "w").close()
    v, _live = snapshot(t)
    assert v == 1
    assert read_table(spark, t).count() == 15


def test_lost_replace_cas_discards_staged_files(spark, tmp_path, monkeypatch):
    """A replace that loses the CAS must not leak its staged parquet
    under data/ — nothing references uncommitted files."""
    import os

    from vector_ai_npm_spark.io import tablelog

    t = str(tmp_path / "t")
    append_table(_df(spark, 0, 10), t)
    append_table(_df(spark, 10, 20), t)
    n_dirs_before = len(os.listdir(f"{t}/data"))
    monkeypatch.setattr(tablelog, "_try_commit", lambda *a, **k: False)
    with pytest.raises(CommitConflict):
        replace_table(read_table(spark, t).coalesce(1), t, 1)
    assert len(os.listdir(f"{t}/data")) == n_dirs_before


def test_append_retry_exhaustion_discards_staged_files(
    spark, tmp_path, monkeypatch
):
    import os

    from vector_ai_npm_spark.io import tablelog

    t = str(tmp_path / "t")
    append_table(_df(spark, 0, 10), t)
    n_dirs_before = len(os.listdir(f"{t}/data"))
    monkeypatch.setattr(tablelog, "_try_commit", lambda *a, **k: False)
    with pytest.raises(CommitConflict):
        append_table(_df(spark, 10, 20), t, max_retries=2)
    assert len(os.listdir(f"{t}/data")) == n_dirs_before


def test_multiprocess_cas_stress_converges(tmp_path):
    """N OS PROCESSES (not threads — separate interpreters, no GIL
    serialization, real scheduler interleaving) hammer one table with
    appends through the CAS loop, with kill-mid-CAS crash injection
    (r12 verdict item 6, mirroring the IVF compaction crash tests):

      * worker 0 SIGKILLs itself at its 3rd attempt AFTER writing+
        fsyncing the temp record but BEFORE the os.link publish — the
        orphan temp must never appear in the log or corrupt the fold;
      * worker 1 SIGKILLs itself right AFTER its 2nd link wins, before
        reporting — the commit is durable and must be discovered from
        the log alone;
      * workers 2-4 run to completion.

    Convergence: the committed version sequence is contiguous 0..V with
    no duplicates, every version reported by a surviving worker is in
    the log, the post-crash worker has exactly crash_at+? committed
    records in the log (its reported ones plus the one unreported), and
    the fold (snapshot) equals the full replay of every add action."""
    import json
    import os
    import subprocess
    import sys

    from vector_ai_npm_spark.io import tablelog

    t = str(tmp_path / "t")
    os.makedirs(t, exist_ok=True)
    worker = os.path.join(os.path.dirname(__file__), "tablelog_stress_worker.py")
    specs = [
        ("0", ["--commits", "6", "--crash-at", "3", "--crash-point", "pre"]),
        ("1", ["--commits", "6", "--crash-at", "2", "--crash-point", "post"]),
        ("2", ["--commits", "8"]),
        ("3", ["--commits", "8"]),
        ("4", ["--commits", "8"]),
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, t, wid, *extra],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for wid, extra in specs
    ]
    outs = [p.communicate(timeout=120) for p in procs]
    reported: dict[str, list[int]] = {}
    for (wid, _), p, (out, err) in zip(specs, procs, outs):
        reported[wid] = [
            int(line.split()[1])
            for line in out.splitlines()
            if line.startswith("committed ")
        ]
        if wid in ("0", "1"):
            assert p.returncode != 0, f"crasher {wid} should have died: {err}"
        else:
            assert p.returncode == 0, f"worker {wid} failed: {err}"
            assert "done" in out

    versions = tablelog._versions(t)
    # contiguous, gap-free, duplicate-free version chain
    assert versions == list(range(len(versions)))
    # per-version owner from the committed records themselves
    owner_commits: dict[str, int] = {}
    all_adds: list[str] = []
    for v in versions:
        with open(tablelog._version_path(t, v), encoding="utf-8") as fh:
            rec = json.load(fh)
        assert rec["version"] == v
        for a in rec["actions"]:
            assert a["op"] == "add"
            all_adds.append(a["file"])
            wid = os.path.basename(a["file"]).split("-")[0][1:]
            owner_commits[wid] = owner_commits.get(wid, 0) + 1
    # every reported commit is in the log under the right version
    for wid, vs in reported.items():
        for v in vs:
            assert v in versions
    # survivors: exactly their requested commit count landed
    for wid in ("2", "3", "4"):
        assert owner_commits.get(wid, 0) == 8
        assert len(reported[wid]) == 8
    # pre-crash worker: its first 3 commits landed, the mid-CAS one did
    # NOT (the temp was never linked)
    assert owner_commits.get("0", 0) == 3
    assert len(reported["0"]) == 3
    # post-crash worker: the unreported-but-durable commit IS in the log
    assert owner_commits.get("1", 0) == 3  # 2 reported + 1 unreported
    assert len(reported["1"]) == 2
    # orphan temp from the mid-CAS death exists but never entered the log
    log_files = os.listdir(tablelog._log_dir(t))
    assert any(f.startswith(".tmp.") for f in log_files)
    # fold == full replay; every live file exists on disk
    top_v, live = tablelog.snapshot(t)
    assert top_v == versions[-1]
    assert sorted(live) == sorted(all_adds)
    for f in live:
        assert os.path.exists(f)

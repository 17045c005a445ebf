"""Manifest-CAS table log — the minimal Delta/Iceberg-style commit
protocol (wave 71), upgrading the store story from "one writer,
enforced by a lease" (io/lease.py, r10 verdict item 8) to REAL
N-writer arbitration:

  * data files are immutable parquet parts with unique names under
    ``{table}/data/``; nothing is ever renamed or rewritten in place;
  * table STATE is the fold of ``{table}/_log/{version:020d}.json``
    commit records (each a list of add/remove file actions);
  * a commit is one atomic PUBLISH of the NEXT version file — the
    payload is fully written (and fsynced) to a temp file first, then
    hard-linked into place; the link either wins or fails with
    FileExistsError (CAS), and the record becomes visible all-at-once,
    so there is neither a rename gap NOR a partial-content window for
    a reader to fall into: readers resolve a snapshot (version + live
    file set) and read exactly those files;
  * every :data:`CHECKPOINT_EVERY` commits the winner also publishes a
    folded checkpoint record, so snapshot() reads O(1) recent log files
    rather than re-folding the whole history (contention stays linear);
  * APPENDS retry on conflict (they commute — re-fold and try the next
    version number); REPLACE commits (compaction, delete-rewrite) carry
    the version they were based on and raise ``CommitConflict`` if
    anyone committed since — optimistic concurrency, the caller
    recomputes against the new snapshot or gives up LOUDLY.

On a real object store the O_EXCL create maps to the store's
conditional-put primitive (S3 If-None-Match, GCS x-goog-if-
generation-match) — same protocol, same failure semantics.

Time travel falls out of the fold: ``snapshot(dir, version=k)``
replays the log prefix, byte-identical to what a reader at version k
saw (nothing it referenced was ever mutated).
"""

from __future__ import annotations

import contextlib
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "CommitConflict",
    "append_table",
    "read_table",
    "replace_table",
    "snapshot",
    "table_history",
]


class CommitConflict(RuntimeError):
    """A replace commit lost the CAS race: someone committed after the
    version this rewrite was computed against."""


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_log")


def _version_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"{version:020d}.json")


def _versions(table_dir: str) -> list[int]:
    d = _log_dir(table_dir)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[:-5])
        for f in os.listdir(d)
        if f.endswith(".json") and f[:-5].isdigit()
    )


def _checkpoint_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"{version:020d}.checkpoint.json")


#: a checkpoint record (folded live set) is written every N commits so
#: snapshot() reads O(1) log files instead of re-folding the whole
#: history on every call — contention no longer degrades quadratically.
CHECKPOINT_EVERY = 16


def _latest_checkpoint(table_dir: str, ceiling: int) -> tuple[int, list[str]] | None:
    """Newest readable checkpoint at version <= ceiling, or None.
    An unreadable checkpoint is skipped (it is pure optimization — the
    commit records underneath it are the source of truth)."""
    d = _log_dir(table_dir)
    if not os.path.isdir(d):
        return None
    cps = sorted(
        (
            int(f[: -len(".checkpoint.json")])
            for f in os.listdir(d)
            if f.endswith(".checkpoint.json")
            and f[: -len(".checkpoint.json")].isdigit()
        ),
        reverse=True,
    )
    for v in cps:
        if v > ceiling:
            continue
        try:
            with open(_checkpoint_path(table_dir, v), encoding="utf-8") as fh:
                rec = json.load(fh)
            return v, list(rec["live"])
        except (OSError, ValueError, KeyError):
            continue
    return None


def snapshot(table_dir: str, version: int | None = None) -> tuple[int, list[str]]:
    """(version, live data files) — the fold of the log prefix.

    ``version=None`` resolves latest; an explicit version is the
    time-travel read (raises if that version was never committed).

    Commit records are published atomically (temp write + os.link in
    :func:`_try_commit`), so a visible version file is always complete;
    as belt-and-braces against logs written by a pre-atomic version of
    this module, an unreadable NEWEST record is treated as in-flight and
    excluded from the snapshot rather than crashing every reader."""
    versions = _versions(table_dir)
    if version is not None:
        if version not in versions:
            raise ValueError(
                f"table {table_dir} has no committed version {version} "
                f"(log: {versions[:5]}...{versions[-5:] if len(versions) > 5 else ''})"
            )
        versions = [v for v in versions if v <= version]
    if not versions:
        return -1, []
    live: list[str] = []
    start = 0
    cp = _latest_checkpoint(table_dir, versions[-1])
    if cp is not None and cp[0] >= versions[0]:
        cp_v, live = cp
        start = versions.index(cp_v) + 1
    for i, v in enumerate(versions[start:], start):
        try:
            with open(_version_path(table_dir, v), encoding="utf-8") as fh:
                rec = json.load(fh)
        except (OSError, ValueError):
            if version is None and i == len(versions) - 1:
                # newest record unreadable = a legacy in-flight commit;
                # the LATEST snapshot is simply "as of the previous
                # version".  An EXPLICIT time-travel read must not get
                # this fallback (r13 advice catch: snapshot(dir, k) with
                # a corrupt record at k would silently serve k-1 under
                # the wrong version number) — fail loudly instead.
                return (versions[i - 1], live) if i > 0 else (-1, [])
            raise
        for action in rec["actions"]:
            if action["op"] == "add":
                live.append(action["file"])
            elif action["op"] == "remove":
                live = [f for f in live if f != action["file"]]
    return versions[-1], live


def _try_commit(table_dir: str, version: int, actions: list[dict]) -> bool:
    """One CAS attempt. True = won.

    The payload is fully written to a temp file FIRST, then published
    atomically with ``os.link`` (hard link creation fails with
    FileExistsError if the version exists — the same CAS semantics as
    O_CREAT|O_EXCL, but the content becomes visible all-at-once, so no
    reader can observe an empty or partial commit record and a crash
    mid-write leaves only an orphaned temp file, never a wedged log)."""
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    path = _version_path(table_dir, version)
    tmp = os.path.join(_log_dir(table_dir), f".tmp.{uuid.uuid4().hex}.json")
    payload = json.dumps({"version": version, "actions": actions})
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(payload)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError:
        return False
    finally:
        with contextlib.suppress(OSError):
            os.unlink(tmp)
    if version > 0 and version % CHECKPOINT_EVERY == 0:
        _write_checkpoint(table_dir, version)
    return True



def _write_checkpoint(table_dir: str, version: int) -> None:
    """Fold the log up to ``version`` and publish it atomically (same
    temp+link discipline).  Best-effort: a lost race or failure is fine,
    checkpoints are pure read-side optimization."""
    try:
        _v, live = snapshot(table_dir, version)
    except (OSError, ValueError):
        return
    tmp = os.path.join(_log_dir(table_dir), f".tmp.{uuid.uuid4().hex}.json")
    try:
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(json.dumps({"version": version, "live": live}))
        os.link(tmp, _checkpoint_path(table_dir, version))
    except OSError:
        pass
    finally:
        with contextlib.suppress(OSError):
            os.unlink(tmp)


def _write_data_files(df: DataFrame, table_dir: str) -> list[str]:
    """Stage immutable parts under data/<uuid>/ and return their paths
    (a unique subdir per write — parquet part names collide across
    writes, uuid dirs never do)."""
    sub = os.path.join(table_dir, "data", uuid.uuid4().hex)
    df.write.mode("overwrite").parquet(sub)
    return sorted(
        os.path.join(sub, f)
        for f in os.listdir(sub)
        if f.endswith(".parquet")
    )


def _discard_staged(files: list[str]) -> None:
    """Delete a staged-but-never-committed uuid subdir so a lost CAS
    doesn't leak orphan parquet under data/ forever (nothing references
    uncommitted files — they are safe to remove unconditionally)."""
    import shutil

    dirs = {os.path.dirname(f) for f in files}
    for d in dirs:
        with contextlib.suppress(OSError):
            shutil.rmtree(d)


def append_table(df: DataFrame, table_dir: str, max_retries: int = 50) -> int:
    """Commit df's rows as new files; appends commute, so conflicts
    retry with the next version number.  Returns the committed version."""
    files = _write_data_files(df, table_dir)
    actions = [{"op": "add", "file": f} for f in files]
    for _ in range(max_retries):
        current, _live = snapshot(table_dir)
        if _try_commit(table_dir, current + 1, actions):
            return current + 1
    _discard_staged(files)
    raise CommitConflict(
        f"append to {table_dir} lost {max_retries} CAS races — "
        "pathological contention (staged files discarded)"
    )


def replace_table(
    df: DataFrame, table_dir: str, expected_version: int
) -> int:
    """Optimistic full rewrite (compaction / delete path): remove every
    file live AT ``expected_version`` and add the new ones — raises
    :class:`CommitConflict` if ANY commit landed since, because the
    rewrite was computed from a stale snapshot and blindly winning
    would silently drop the interleaved writer's rows."""
    current, live = snapshot(table_dir)
    if current != expected_version:
        raise CommitConflict(
            f"replace of {table_dir} was computed against version "
            f"{expected_version} but the table is at {current} — "
            "recompute against the current snapshot"
        )
    files = _write_data_files(df, table_dir)
    actions = [{"op": "remove", "file": f} for f in live] + [
        {"op": "add", "file": f} for f in files
    ]
    if not _try_commit(table_dir, expected_version + 1, actions):
        _discard_staged(files)
        raise CommitConflict(
            f"replace of {table_dir} lost the CAS race for version "
            f"{expected_version + 1} — recompute against the new snapshot "
            "(staged files discarded)"
        )
    return expected_version + 1


def read_table(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame | None:
    """Snapshot-isolated read (optionally as-of a version); None for an
    empty table.  No rename gap exists to retry around — the snapshot's
    files are immutable."""
    _v, live = snapshot(table_dir, version)
    if not live:
        return None
    return spark.read.parquet(*live)


def table_history(table_dir: str) -> list[dict]:
    """The committed log, oldest first — (version, n_adds, n_removes)."""
    out = []
    for v in _versions(table_dir):
        with open(_version_path(table_dir, v), encoding="utf-8") as fh:
            rec = json.load(fh)
        ops = [a["op"] for a in rec["actions"]]
        out.append(
            {
                "version": v,
                "n_adds": ops.count("add"),
                "n_removes": ops.count("remove"),
            }
        )
    return out

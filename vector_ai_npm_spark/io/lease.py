"""Table-level writer lease for the versioned parquet stores.

The engine's mutation paths (`VectorEngine.ingest_data` append,
`VectorEngine.delete_data` rewrite + two-rename swap) were written for
one writer per table: an append landing between delete's snapshot read
and its rename swap would be silently swept, and two concurrent deletes
race their renames (r10 verdict item 8).  This module makes the
single-writer assumption ENFORCED rather than assumed:

  * `writer_lease(path, op)` — a context manager that serializes
    writers on `{path}.__writer_lock`, created with O_CREAT|O_EXCL
    (atomic on POSIX — the same primitive the IVF store's compaction
    protocol uses, retrieval/store.py).  Waiters poll until `timeout_s`,
    then raise `StoreWriterConflict` LOUDLY — a second writer can wait
    or fail, never interleave.
  * crash recovery — the lock file records the holder's pid; a lock
    whose holder is dead (os.kill(pid, 0) fails) is broken and retried,
    so a crashed writer never wedges the table.  An unreadable/ancient
    lock (no parsable pid, older than `stale_after_s`) breaks the same
    way.
  * `claim_store(store_dir, owner_id)` — the streaming sink's OWNER
    PIN: versioned stores are written by exactly one stream lifetime
    (versions are the stream's own batch ids, so a second stream with a
    different checkpoint would publish colliding version numbers that
    silently shadow the first stream's totals).  The first claim writes
    `__owner` atomically; re-claiming with the SAME owner id is the
    restart path (a no-op); a DIFFERENT owner raises.

Scope note: this is machine-local arbitration (lock file + pid
liveness), matching this environment's single-host stores.  A
multi-host deployment swaps the primitive for a manifest-CAS on the
shared filesystem / object store (documented out of scope, SURVEY §1.1)
— the call sites and failure semantics (converge or raise, never
silent) stay the same.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

__all__ = ["StoreWriterConflict", "writer_lease", "claim_store"]


class StoreWriterConflict(RuntimeError):
    """Another live writer holds the table; raised instead of
    interleaving (silence is the only wrong answer)."""


def _lock_path(path: str) -> str:
    return f"{path.rstrip('/')}.__writer_lock"


def _holder_alive(lock_file: str, stale_after_s: float) -> bool:
    """True iff the lock's recorded holder is a live process.

    Pid liveness is the PRIMARY signal: a legitimate writer whose
    delete/rewrite runs longer than the staleness horizon keeps its
    lock (breaking it on age alone would let a waiter interleave —
    exactly the hazard the lease exists to prevent).  The ts horizon is
    used ONLY as a pid-reuse guard: a lock so old that the recorded pid
    plausibly belongs to a different process by now (>= 24h or 100x the
    horizon, whichever is larger) is treated as abandoned even if some
    process answers to that pid."""
    try:
        with open(lock_file, encoding="utf-8") as fh:
            meta = json.load(fh)
        pid = int(meta["pid"])
        ts = float(meta.get("ts", 0.0))
    except (OSError, ValueError, KeyError, TypeError):
        return False  # unreadable/corrupt lock = breakable
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False  # holder is dead — breakable
    except PermissionError:
        pass  # exists but owned elsewhere — alive
    pid_reuse_horizon = max(86_400.0, 100.0 * stale_after_s)
    if ts and time.time() - ts > pid_reuse_horizon:
        return False  # ancient lock: the live pid is plausibly reused
    return True


@contextlib.contextmanager
def writer_lease(
    path: str,
    op: str = "write",
    timeout_s: float = 30.0,
    stale_after_s: float = 600.0,
    poll_s: float = 0.05,
):
    """Exclusive writer lease on a store path (see module docstring).

    Raises :class:`StoreWriterConflict` if a LIVE holder is still there
    after ``timeout_s``.  Dead/stale holders are broken and the lease
    retried — crash recovery, not contention."""
    lock_file = _lock_path(path)
    os.makedirs(os.path.dirname(lock_file) or ".", exist_ok=True)
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fd = os.open(lock_file, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            if not _holder_alive(lock_file, stale_after_s):
                # crashed holder: break the lock and race to re-acquire
                # (the unlink may lose to another breaker — that's fine,
                # O_EXCL stays the single arbiter)
                with contextlib.suppress(OSError):
                    os.unlink(lock_file)
                continue
            if time.monotonic() >= deadline:
                raise StoreWriterConflict(
                    f"another writer holds {lock_file} (op={op!r}); "
                    "refusing to interleave — retry after it finishes "
                    "or raise timeout_s"
                ) from None
            time.sleep(poll_s)
    try:
        os.write(
            fd,
            json.dumps(
                {"pid": os.getpid(), "op": op, "ts": time.time()}
            ).encode(),
        )
        os.close(fd)
        yield
    finally:
        # Unlink only if the lock still records OUR pid — if another
        # waiter (wrongly or rightly) broke and re-acquired it, blindly
        # unlinking would evict the new holder and let a THIRD writer in.
        with contextlib.suppress(OSError, ValueError, KeyError, TypeError):
            with open(lock_file, encoding="utf-8") as fh:
                if int(json.load(fh)["pid"]) == os.getpid():
                    os.unlink(lock_file)


def claim_store(store_dir: str, owner_id: str) -> None:
    """Pin ``store_dir`` to one stream lifetime (see module docstring).

    First claim publishes ``__owner`` atomically (O_EXCL + same-content
    tolerance for the lost race); a re-claim with the same ``owner_id``
    is the restart path; any other owner raises
    :class:`StoreWriterConflict`."""
    os.makedirs(store_dir, exist_ok=True)
    marker = os.path.join(store_dir, "__owner")
    # Publish atomically: write owner_id to a temp file, hard-link into
    # place.  The marker is either absent or COMPLETE — a crash between
    # create and write can no longer leave an empty marker that wedges
    # every future claim (including the original stream's own restart).
    # Bounded retry (r13 advice catch: the old recursive retry could
    # recurse unboundedly on an empty-but-undeletable marker, and an
    # OSError on READ — EACCES/EIO/transient NFS — was conflated with
    # the legacy empty-marker case, silently admitting a second writer
    # where the pin must raise; fail CLOSED on anything but a confirmed
    # zero-length readable marker).
    tmp = os.path.join(store_dir, f".__owner.tmp.{os.getpid()}")
    for _ in range(3):
        claimed = False
        try:
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(owner_id)
            try:
                os.link(tmp, marker)
                claimed = True
            except FileExistsError:
                pass
        finally:
            with contextlib.suppress(OSError):
                os.unlink(tmp)
        if claimed:
            return
        try:
            with open(marker, encoding="utf-8") as fh:
                current = fh.read()
        except OSError as exc:
            raise StoreWriterConflict(
                f"store {store_dir} has an owner marker that cannot be "
                f"read ({exc}); refusing to claim — a second writer would "
                "publish colliding version numbers"
            ) from exc
        if current == "":
            # Confirmed zero-length readable marker = a legacy partial
            # claim (pre-atomic writer crashed mid-publish).  Treat as
            # unclaimed: remove and retry the atomic publish.  An
            # undeletable empty marker falls out of the loop and raises.
            try:
                os.unlink(marker)
            except FileNotFoundError:
                pass  # someone else cleaned it — retry the publish
            except OSError as exc:
                raise StoreWriterConflict(
                    f"store {store_dir} has an empty owner marker that "
                    f"cannot be removed ({exc}); refusing to claim"
                ) from exc
            continue
        if current != owner_id:
            raise StoreWriterConflict(
                f"store {store_dir} is owned by stream {current!r}; a "
                f"second stream ({owner_id!r}) would publish colliding "
                "version numbers that silently shadow the first — point "
                "the new stream at a fresh store_dir or reuse the "
                "original checkpoint"
            )
        return  # restart path: same owner re-claims, no-op
    raise StoreWriterConflict(
        f"store {store_dir}: could not converge on an owner claim after "
        "3 attempts (marker kept reappearing empty); refusing to claim"
    )

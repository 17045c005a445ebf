"""Subprocess worker for the multi-process tablelog CAS stress test
(tests/test_wave71.py::test_multiprocess_cas_stress_converges).

Each worker hammers the SAME table with appends through the real CAS
loop (`snapshot` + `_try_commit` — the exact arbitration `append_table`
runs; the parquet data-file write is orthogonal and covered by the
Spark-side tests, so the staged "data files" here are touched stubs).

Crash injection (`--crash-at N --crash-point pre|post`): at the Nth
commit attempt the worker SIGKILLs itself (`os._exit`) either

  * ``pre``  — after the temp record is written+fsynced but BEFORE the
    ``os.link`` publish: the classic mid-CAS death, leaving an orphan
    temp file that must never corrupt the log; or
  * ``post`` — immediately AFTER the link wins: the commit IS durable,
    the process just never reported it; convergence must count it.

Output protocol: one line ``committed <version>`` per won commit, then
``done`` (crashed workers never print ``done`` — the parent treats
their reported commits as a lower bound for ``pre`` and exact-minus-
one for ``post``).
"""

from __future__ import annotations

import argparse
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_ai_npm_spark.io import tablelog  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("table_dir")
    ap.add_argument("worker_id")
    ap.add_argument("--commits", type=int, default=10)
    ap.add_argument("--crash-at", type=int, default=-1)
    ap.add_argument("--crash-point", choices=("pre", "post"), default="pre")
    args = ap.parse_args()

    data_dir = os.path.join(args.table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    committed = 0
    while committed < args.commits:
        # stage one immutable "data file" (unique name, like the real
        # parquet part writer)
        fname = os.path.join(
            data_dir, f"w{args.worker_id}-{uuid.uuid4().hex}.part"
        )
        with open(fname, "w", encoding="utf-8") as fh:
            fh.write(args.worker_id)
        actions = [{"op": "add", "file": fname}]
        while True:  # the append CAS loop: commute, retry next version
            current, _live = tablelog.snapshot(args.table_dir)
            target = current + 1
            if committed == args.crash_at and args.crash_point == "pre":
                # die mid-CAS: temp written+fsynced, link never issued.
                # Replicate _try_commit's temp-write phase exactly.
                import json

                tablelog.os.makedirs(
                    tablelog._log_dir(args.table_dir), exist_ok=True
                )
                tmp = os.path.join(
                    tablelog._log_dir(args.table_dir),
                    f".tmp.{uuid.uuid4().hex}.json",
                )
                with open(tmp, "w", encoding="utf-8") as fh:
                    fh.write(
                        json.dumps({"version": target, "actions": actions})
                    )
                    fh.flush()
                    os.fsync(fh.fileno())
                os._exit(9)
            if tablelog._try_commit(args.table_dir, target, actions):
                if (
                    committed == args.crash_at
                    and args.crash_point == "post"
                ):
                    # commit IS durable; die before reporting it — the
                    # parent must discover it from the log itself
                    os._exit(9)
                committed += 1
                print(f"committed {target}", flush=True)
                break
    print("done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

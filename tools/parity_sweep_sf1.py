#!/usr/bin/env python
"""The round-10 confidence sweep: oracle parity for every HEADLINE
(bench) query at sf1 (~6M lineitem / 1M events / 50k docs / 20k
vectors — tools/gen_sf1.py's fresh-draw dataset, NOT a replica).

Why sf1 when the driver gates at sf0.01 and the standing runbook
sweeps sf0.1: each magnitude has exposed a new cross-engine
divergence class (round 8: repr-vs-binary half-points, zlib envelope
constants, fixed ADC budgets; round 9: float32 promotion, PPR
half-point, Kendall quadratic pairing) — and the value populations at
sf1 are 10× larger again, so bridge-bound/overflow classes
(`events_trend_ols`'s BIGINT lesson) get one more decade of exposure.

    python tools/gen_sf1.py --gen-only   # once (~1 min, /tmp/sf1)
    python tools/parity_sweep_sf1.py     # the sweep (~20-40 min)

Writes tools/logs/parity_sweep_sf1_r{N}.log; exit code is the gate.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF1 = "/tmp/sf1"
LOG = Path(__file__).parent / "logs" / "parity_sweep_sf1_r10.log"


def main() -> int:
    import bench
    from tests.oracle_harness import (
        compare,
        driver_canon_problems,
        run_spark_query,
    )

    from vector_ai_npm_spark import registry
    from vector_ai_npm_spark.session import get_spark

    if not Path(SF1).exists():
        print("generate /tmp/sf1 first: python tools/gen_sf1.py --gen-only")
        return 2
    spark = get_spark("sf1-parity-sweep")
    oracles = registry.all_oracles()
    queries = registry.all_queries()
    names = [n for n in bench.BENCH_QUERIES if n in queries]
    failures: list[str] = []
    lines: list[str] = []
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        try:
            if name in oracles:
                problems = compare(spark, name, oracles[name], SF1)
                status = "ok" if not problems else "FAIL"
            else:
                cols, rows = run_spark_query(spark, name, SF1)
                problems = driver_canon_problems(cols, rows)
                status = (
                    f"rows-only ok ({len(rows)} rows)"
                    if not problems
                    else "FAIL"
                )
        except Exception as exc:  # noqa: BLE001 — the log IS the report
            problems = [f"exception: {exc!r}"]
            status = "FAIL"
        dt = time.perf_counter() - t0
        line = f"[{i:2d}/{len(names)}] {name:32s} {status:12s} {dt:7.1f}s"
        print(line, flush=True)
        lines.append(line)
        if problems:
            failures.append(name)
            for p in problems[:6]:
                print("    " + p.replace("\n", "\n    "), flush=True)
                lines.append("    " + p)
    summary = (
        f"sf1 sweep: {len(names) - len(failures)}/{len(names)} green"
        + (f"; FAILURES: {failures}" if failures else "")
    )
    print(summary)
    lines.append(summary)
    LOG.parent.mkdir(exist_ok=True)
    LOG.write_text("\n".join(lines) + "\n")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

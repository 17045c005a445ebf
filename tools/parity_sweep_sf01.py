"""Standing round gate: the full oracle-parity sweep at sf0.1.

The sf0.01 driver gate verifies per-query correctness at fixture
scale; this sweep re-runs the SAME exact-match harness at 10× data,
where a different class of bug becomes visible — cross-engine float
determinism bounds that only trip on larger value populations, and
genuine scale-design bugs (round 8 caught four in one run: the TWAP
repr-vs-binary half-point, the zlib envelope's additive constant, and
two fixed ADC re-rank shortlists starving recall as the corpus grew).

Run ONCE per round before promoting a new wave into the registry:

    python tools/parity_sweep_sf01.py

which is just a pinned spelling of:

    SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.1 \
        python -m pytest tests/test_oracle_parity.py -q

Expect ~20-40 minutes on local[32] (every registry query runs on both
engines at sf0.1).  The exit code is the gate; the log is worth
committing to the round notes when it catches something.
"""

from __future__ import annotations

import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.1")


def main() -> int:
    env = dict(os.environ, SPARK_GRAFT_PARITY_SF=SF_DIR)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [
        sys.executable, "-m", "pytest",
        "tests/test_oracle_parity.py", "-q",
    ]
    print(f"sf0.1 parity sweep: SPARK_GRAFT_PARITY_SF={SF_DIR}", flush=True)
    return subprocess.call(cmd, cwd=repo, env=env)


if __name__ == "__main__":
    raise SystemExit(main())

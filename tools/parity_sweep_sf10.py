#!/usr/bin/env python
"""Round-12 sf10 spot sweep: the scale-sensitive class at one more
magnitude (200k vectors / 500k docs / 10M events / ~60M lineitem —
tools/gen_sf1.py with SPARK_GRAFT_GEN_MULT=10, fresh draws).

Every magnitude so far exposed a new divergence class (float32 ties,
BIGINT overflow, recall floors, ADC noise); this runs the ~60
ANN/sketch/recall/stat queries before the registry grows again.
Per-query watchdog cancels Spark jobs after a budget and records
TIMEOUT instead of wedging the sweep.

    SPARK_GRAFT_GEN_MULT=10 SPARK_GRAFT_GEN_DST=/tmp/sf10 \
        python tools/gen_sf1.py --gen-only      # once (~3 min)
    python tools/parity_sweep_sf10.py           # the r12 spot list
    python tools/parity_sweep_sf10.py --names a,b,c --tag r13_knng
    python tools/parity_sweep_sf10.py --all --tag r13_full   # whole registry

Writes tools/logs/parity_sweep_sf10_<tag>.log; exit code is the gate.
"""

from __future__ import annotations

import argparse
import contextlib
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF10 = "/tmp/sf10"
PER_QUERY_BUDGET_S = 900.0

# scale-sensitive class: ANN recall contracts + sketches + stat
# estimators + the quantizer family + the dedup estimate faces
NAMES = [
    # sketches / approx aggregates
    "agg_approx_distinct", "agg_approx_percentile",
    "agg_approx_percentile_bounds", "agg_count_min_sketch",
    "agg_kll_quantiles", "agg_sketch_distinct", "agg_sketch_merge",
    "agg_sketch_setops", "agg_percentile", "agg_percentile_dist",
    "agg_weighted_percentile", "dedup_minhash_estimate",
    # stats with overflow/tie history
    "agg_gini", "agg_corr_matrix", "feature_standardize",
    "feature_gini_impurity", "events_trend_ols", "events_autocorr",
    "eval_kendall_tau", "eval_kendall_tau_exact", "eval_spearman_corr",
    "ab_bootstrap_ci", "vector_mean_pool", "cluster_kmeans_assign",
    # ANN family + recall contracts
    "ann_recall_vs_exact", "similarity_search_ann",
    "similarity_search_ivf", "similarity_search_ivf_filtered",
    "similarity_search_ivfpq", "similarity_search_ivfrq",
    "similarity_search_opq",
    "ivf_store_recall", "ivf_filtered_recall_contract", "ivfpq_recall",
    "ivfrq_recall_contract", "opq_recall", "vector_matryoshka_recall",
    "vector_recall_curve", "vector_ivf_nlist_sweep", "graph_knn_curve",
    "vector_quantize_binary", "vector_quantize_pq", "vector_quantize_rq",
    "vector_quantize_sq8",
    "vector_store_ivf", "vector_store_ivf_append",
    "vector_store_ivf_compact", "vector_store_ivf_delete",
    "stream_ivf_append",
    "mmr_rerank", "mmr_contract",
    # dedup estimate/recall faces (the exact pair faces ran at sf1)
    "dedup_simhash", "dedup_semantic", "semdedup_recall",
    "jaccard_cap_recall", "lsh_dedup_recall", "dedup_near_lsh_routed",
    "mine_bitext_margin", "mine_bitext_margin_ann",
    # the two graph-ANN faces LAST (heaviest: 200k-vector builds)
    "similarity_search_knn_graph", "knn_graph_recall_contract",
]


def main() -> int:
    from tests.oracle_harness import (
        compare,
        driver_canon_problems,
        run_spark_query,
    )

    from vector_ai_npm_spark import registry
    from vector_ai_npm_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--names", help="comma-separated query names to run")
    ap.add_argument(
        "--all", action="store_true",
        help="run the WHOLE registry (r13 full sweep), not the r12 spot list",
    )
    ap.add_argument("--tag", default="r12", help="log filename tag")
    ap.add_argument(
        "--budget", type=float, default=PER_QUERY_BUDGET_S,
        help="per-query watchdog seconds (raise for the 66-min knn build)",
    )
    ap.add_argument(
        "--skip", default="",
        help="comma-separated names to skip (e.g. classified oracle limits)",
    )
    args = ap.parse_args()
    log = Path(__file__).parent / "logs" / f"parity_sweep_sf10_{args.tag}.log"

    if not Path(SF10).exists():
        print("generate /tmp/sf10 first (see module docstring)")
        return 2
    spark = get_spark("sf10-parity-sweep")
    oracles = registry.all_oracles()
    queries = registry.all_queries()
    if args.names:
        wanted = [n.strip() for n in args.names.split(",") if n.strip()]
    elif args.all:
        wanted = sorted(queries)
    else:
        wanted = NAMES
    skip = {n.strip() for n in args.skip.split(",") if n.strip()}
    names = [n for n in wanted if n in queries and n not in skip]
    failures: list[str] = []
    lines: list[str] = []
    log.parent.mkdir(parents=True, exist_ok=True)

    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        # Run the query in a worker thread under a per-query JOB GROUP
        # and cancel the GROUP repeatedly on timeout (r13: a single
        # cancelAllJobs only kills currently-running jobs — an
        # iterative face like basket_itemsets_apriori just launches its
        # next job and ran 35+ min past the budget, wedging the sweep).
        # Pinned-thread mode makes setJobGroup thread-local, so later
        # queries' jobs are never collateral damage.
        result: dict = {}

        def _work(name=name):
            try:
                spark.sparkContext.setJobGroup(
                    name, f"sweep:{name}", interruptOnCancel=True
                )
                if name in oracles:
                    result["problems"] = compare(
                        spark, name, oracles[name], SF10
                    )
                else:
                    cols, rows = run_spark_query(spark, name, SF10)
                    result["problems"] = driver_canon_problems(cols, rows)
            except Exception as exc:  # noqa: BLE001 — sweep must continue
                result["exc"] = exc
            finally:
                with contextlib.suppress(Exception):
                    spark.sparkContext.clearJobGroup()

        w = threading.Thread(target=_work, daemon=True)
        w.start()
        w.join(args.budget)
        timed_out = w.is_alive()
        if timed_out:
            grace = time.monotonic() + 180.0
            while w.is_alive() and time.monotonic() < grace:
                with contextlib.suppress(Exception):
                    spark.sparkContext.cancelJobGroup(name)
                w.join(5.0)
        if timed_out:
            problems = [f"budget {args.budget:.0f}s exceeded"]
            status = "TIMEOUT"
        elif "exc" in result:
            problems = [f"{type(result['exc']).__name__}: {result['exc']}"]
            status = "ERROR"
        else:
            problems = result.get("problems", ["worker returned nothing"])
            status = "ok" if not problems else "FAIL"
        dt = time.perf_counter() - t0
        line = f"[{i:2d}/{len(names)}] {name:36s} {status:7s} {dt:8.1f}s"
        if status != "ok":
            failures.append(name)
            line += " | " + "; ".join(str(p)[:300] for p in problems[:3])
        print(line, flush=True)
        lines.append(line)
        log.write_text("\n".join(lines) + "\n")

    summary = (
        f"sf10 sweep: {len(names) - len(failures)}/{len(names)} green; "
        f"failures: {failures}"
    )
    print(summary, flush=True)
    lines.append(summary)
    log.write_text("\n".join(lines) + "\n")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

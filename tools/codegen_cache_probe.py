"""Reproduce the codegen-cache classloader evidence (r13 Change 1, r14
VERDICT item 7) on a fresh JVM.

Runs a configurable slice of the bench query mix twice through one
session (the bench's repeat pattern) with
``spark.sql.codegen.cache.maxEntries`` taken from
$SPARK_GRAFT_CODEGEN_CACHE, and samples ``jstat -class`` on the driver
JVM before/after, printing unloaded-class count and classloader seconds.
Run once with SPARK_GRAFT_CODEGEN_CACHE=100 (the Spark default) and once
unset (the session default 5000) and compare:

    SPARK_GRAFT_CODEGEN_CACHE=100 python tools/codegen_cache_probe.py
    python tools/codegen_cache_probe.py

The deltas are the committed evidence for sizing the cache to the query
mix; see OPTIMIZATION_r13.md Change 1 / OPTIMIZATION_r14.md.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# a representative slice of the pinned mix: enough distinct queries to
# overflow a 100-entry codegen cache (~5-8 codegen units each), small
# enough to finish in ~2 min
QUERIES = (
    "agg_groupby", "tpch_q3", "tpch_q5", "tpch_q7", "tpch_q8", "tpch_q9",
    "tpch_q21", "filter_project", "join_broadcast", "join_sortmerge",
    "join_asof", "window_rank", "window_analytics", "pivot_orders",
    "similarity_search_topk", "join_similarity", "dedup_minhash_pairs",
    "dedup_ngram_jaccard", "text_stats", "text_fingerprint",
    "chunk_split_headers", "agg_percentile_dist", "events_rfm",
    "orders_pareto_abc", "dedup_time_window", "text_pmi_cooccur",
    "ab_test_summary", "eval_auc_rank", "feature_rank_normalize",
    "dq_t_closeness", "eval_average_precision", "agg_weighted_percentile",
    "eval_lift_gain", "attribution_time_decay", "events_interarrival",
    "embedding_centroid_drift", "events_lateness_profile",
    "eval_kendall_tau", "cluster_grid_density", "dq_checks",
)


def jstat_class(pid: int) -> tuple[int, float]:
    """(unloaded_classes, classloader_seconds) from `jstat -class`."""
    out = subprocess.run(
        ["jstat", "-class", str(pid)], capture_output=True, text=True,
        check=True,
    ).stdout.splitlines()
    hdr, vals = out[0].split(), out[1].split()
    row = dict(zip(hdr, vals))
    return int(row["Unloaded"]), float(row["Time"])


def main() -> None:
    from vector_ai_npm_spark import registry
    from vector_ai_npm_spark.session import get_spark

    queries_list = QUERIES
    if "--full" in sys.argv:
        # the full pinned bench mix — the working set the r13 evidence
        # was measured under (the 40-query slice above does NOT
        # overflow a 100-entry cache hard enough to show the thrash)
        import bench

        queries_list = bench.BENCH_QUERIES

    cache = os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "5000 (default)")
    spark = get_spark("codegen-cache-probe")
    jvm_pid = None
    # the py4j gateway child is the driver JVM
    try:
        import psutil  # noqa: F401
    except ImportError:
        pass
    # find the java child of this process
    out = subprocess.run(
        ["pgrep", "-P", str(os.getpid()), "java"],
        capture_output=True, text=True,
    ).stdout.split()
    if out:
        jvm_pid = int(out[0])
    if jvm_pid is None:
        print("could not locate driver JVM pid; aborting", file=sys.stderr)
        sys.exit(1)

    queries = registry.all_queries()
    names = [n for n in queries_list if n in queries]
    u0, t0 = jstat_class(jvm_pid)
    wall0 = time.perf_counter()
    from pyspark.sql import functions as F

    def force(df):
        df.select(
            F.count(F.lit(1)),
            *[F.count(c) for c in df.columns],
        ).collect()

    for rep in range(2):
        for n in names:
            force(queries[n](spark, SF_DIR))
    wall = time.perf_counter() - wall0
    u1, t1 = jstat_class(jvm_pid)
    print(
        f"codegen.cache.maxEntries={cache}: {len(names)} queries x 2 reps "
        f"in {wall:.1f}s | classes unloaded {u1 - u0} | "
        f"classloader time +{t1 - t0:.1f}s (totals: {u1} / {t1:.1f}s)"
    )
    spark.stop()


if __name__ == "__main__":
    main()

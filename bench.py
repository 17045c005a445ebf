#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

The stdout line is kept under the driver's 2000-char tail-capture budget
(compact separators, 2-decimal values, no regressions dup); the
full-precision record — timings, vs_target, regressions, pinned targets —
is written to bench_last.json next to this script on every run.

Each query is fully materialized via a count-ish action that forces every
operator (collect would skew toward driver transfer; count() alone could
let Spark skip projections — we aggregate a checksum over all output
columns instead). Timings include plan + execution, excluding session
startup; a warmup pass primes the JVM/code cache unless
SPARK_GRAFT_NO_WARMUP is set.
"""

from __future__ import annotations

import json
import os
import sys
import time

# headline set: the flagship pipeline + one representative per family
BENCH_QUERIES = (
    "agg_groupby",            # B10 hash agg (TPC-H Q1 shape)
    "tpch_q3",                # 3-way join + agg + top-10
    "tpch_q5",                # 5-way join with theta condition
    "filter_project",         # B3 pushdown scan
    "join_broadcast",         # B4 broadcast join
    "join_sortmerge",         # B5 shuffle join chain
    "join_asof",              # B8 single-shuffle as-of
    "window_rank",            # B13 window top-k per key
    "similarity_search_topk", # A7 brute-force cosine top-k
    "join_similarity",        # B9 multi-query similarity join
    "dedup_minhash_pairs",    # B18 banded LSH candidates
    "dedup_ngram_jaccard",    # B18 exact blocked jaccard
    "text_stats",             # B19 tokenize + agg
    "text_fingerprint",       # rolling-hash fold
    "chunk_split_headers",    # A1 chunking
    "ingest_pipeline",        # A13 end-to-end (subsplit + embed UDFs)
    "stream_session",         # B26 session windows
    "stream_tumbling",        # B25 tumbling windows
    "tpch_q7",                # 6-way join, nation-pair disjunction
    "tpch_q8",                # 8-way join, conditional-sum ratio
    "tpch_q21",               # semi+anti correlated pair
    "agg_percentile_dist",    # distributed exact quantiles (vs 3-task sort agg)
    "window_analytics",       # ntile/percent_rank/cume_dist + frames
    "pivot_orders",           # single-pass conditional-agg pivot
    "stream_join_interval",   # stream-stream interval join (batch face)
    "corpus_curate",          # flagship composite: quality ∧ lang ∧ dedup-canonical
    "tpch_q9",                # widest join: fact ⋈ 4 dims ⋈ derived partsupp
    "agg_sketch_distinct",    # mergeable HLL/theta: constant-size shuffle state
    "similarity_search_ann",  # LSH-pruned batch ANN (recall≥0.9 pinned in tests)
    "similarity_search_ivf",  # IVF cell-partitioned ANN store + pruned search
    "dedup_embedding_ann",    # LSH-routed near-dup at t=0.95 (recall 1.0 pinned)
    "concurrency_sweep",      # distributed sweep line (two-level prefix sum)
    "timeseries_gapfill",     # calendar densification + LOCF window
    "mmr_rerank",             # MMR diverse retrieval (Arrow greedy per query)
    "vector_quantize_pq",     # PQ train/encode/ADC contract (32x compression)
    "graph_triangles",        # degree-oriented triangle count (wedge-bound)
    "graph_pagerank",         # 3-step power method, cached edge frame
    "basket_lift",            # grouped-basket inline pair expansion + metrics
    "events_rfm",             # two-level exact ntiles over the user frame
    "dq_checks",              # one-scan-per-fact constraint suite
    "orders_pareto_abc",      # exact-decimal two-level cumulative share
    "dedup_time_window",      # keyed WindowGroupLimit event dedup
    "text_pmi_cooccur",       # type-count shuffles + broadcast unigrams
    "graph_kcore",            # iterative peel, per-round checkpoint
    "graph_community_lpa",    # 3-round synchronous LPA unroll
    "ab_test_summary",        # join-free two-level experiment rollup
    "events_markov_transitions",  # one fact shuffle -> matrix-sized agg
    "join_interval_overlap",  # grid-binned interval join (no theta NLJ)
    "graph_bfs_frontier",     # 3-round frontier BFS, checkpointed lineage
    "sample_weighted_topk",   # E-S weighted sample: scan + TakeOrdered
    # wave-9/10/11 promotions (round-7 verdict ask #3); targets pinned
    # from the round-7 idle best-of-5 (sf0.1, local[32])
    "text_bm25",              # Okapi BM25: df/dl matrix windows, one tokenize
    "lm_kneser_ney",          # interpolated KN bigram LM over type counts
    "events_survival_km",     # Kaplan-Meier life table (day-level frame)
    "multimodal_dhash_pairs", # banded Hamming join over 64-bit dHashes
    "text_rake_keywords",     # RAKE phrase typing (types, never re-joins corpus)
    # wave-13/14/15 promotions; targets pinned from the round-7 idle
    # best-of-5 (sf0.1, local[32])
    "eval_auc_rank",          # Mann-Whitney AUC, two-level prefix ranks
    "feature_rank_normalize", # mid-rank percentile transform + fact join-back
    "dq_t_closeness",         # ordered-attribute EMD per QI group
    "multimodal_channel_stats",  # corpus pixel mean/std through real decode
    # wave-16 promotions (round-7 verdict ask #6); targets pinned from
    # the round-8 idle best-of-5 (sf0.1, local[32])
    "eval_average_precision", # AUPRC via distinct-score frame + 1-row fold
    "agg_weighted_percentile", # weighted quantiles, shared two-level prefix
    "graph_hits",             # 4 half-steps of edge-score joins (hub-proof)
    # wave-20..24 promotions; targets pinned from the round-8 idle
    # best-of-5 (sf0.1, local[32])
    "eval_lift_gain",         # two-level ntile deciles + 10-row cum windows
    "attribution_time_decay", # user-equi pair join + exact micro-ledger
    "events_interarrival",    # user lag gaps -> prefix-bucketed quantiles
    "embedding_centroid_drift",  # posexplode -> (label,dim) decimal agg
    "events_lateness_profile",   # user prefix-max + bucketed quantiles
    # round-9 promotions (waves 33-36) — pinned from the round-9 idle
    # best-of-5 (sf0.1, local[32])
    "eval_kendall_tau",          # joint-histogram pair counting
    "ab_bootstrap_ci",           # 101-rep deterministic multiplier bootstrap
    "vector_quantize_binary",    # sign codes + Hamming shortlist + re-rank
    "retrieval_late_interaction",  # 4x4 slice-cosine MaxSim scoring
    "graph_pagerank_personalized", # 3-step PPR, floor-ledger folds
    "multimodal_decode_gif",     # pure-Python LZW encode+decode roundtrip
    "eval_rank_rbo",             # TakeOrdered top-10 frames + 10-row fold
    "cluster_grid_density",      # cell-DBSCAN: one scan + cell frames
    "stream_dlq_route",          # 3 micro-batches, batch-keyed legs
    # round-10 promotions (verdict ask #7: track the MAINTENANCE path's
    # cost round-over-round like the query path's) — pinned from the
    # round-10 idle best-of-5 (sf0.1, local[32])
    "vector_store_ivf_compact",  # build + 2 appends + fold + self-search
    "stream_ivf_append",         # availableNow stream -> batch-keyed appends
    "scan_jsonl_corrupt",        # PERMISSIVE JSONL + quarantine split
    "udf_grouped_agg",           # GROUPED_AGG pandas UDF micro-ledger
    "multimodal_webp_dims",      # no-codec container audit (map-only)
    # round-10 wave promotions (waves 45-54) — pinned from the
    # round-10 idle best-of-5 (sf0.1, local[32])
    "eval_kendall_tau_exact",    # guarded unsampled tau (opt-in exact face)
    "multimodal_decode_tiff",    # PackBits/TIFF-LZW pixel decode roundtrip
    "multimodal_decode_webp",    # VP8L lossless codec, 4 encoder paths
    "multimodal_exif_orientation",  # APP1/IFD orientation audit
    "multimodal_pdf_pages",      # xref-skeleton page-volume audit
    "similarity_search_ivf_filtered",  # predicate-widened IVF probe
    "vector_quantize_rq",        # residual stages + stage-LUT ADC
    "graph_ktruss",              # edge-support peel to fixpoint
    "scan_jsonl_gzip",           # non-splittable gzip member scan
    "scan_csv_dialect",          # sniffed-dialect CSV scans
    "scan_python_datasource",    # Spark 4 Python source write/read/pushdown
    "stream_join_left_outer",    # outer interval join (eviction batch face)
    # round-11 promotions (waves 65-72).  Deliberately NOT promoted:
    # multimodal_decode_jpeg_variants (~75 s of intrinsic pure-Python
    # codec work per run — §4x row + correctness sweeps cover it;
    # production swaps libjpeg behind has_native_jpeg), graph_scc and
    # stream_dedup_within_watermark (~10-15 s lifecycle/stream runs
    # whose cost is trigger/round-count, already §4x-rowed).
    "vector_store_ivf_delete",   # tombstone delete lifecycle (IVF 3rd verb)
    "udtf_table_argument",       # TABLE(...) PARTITION BY UDTF fold
    "scan_npy_embeddings",       # .npy shard sink/source roundtrip
    "join_temporal_validity",    # SCD2 point-in-time join
    "ivm_incremental_agg",       # signed-delta view maintenance
    "store_manifest_acid",       # manifest-CAS commits + time travel
    "eval_bleu_components",      # clipped n-gram pair verification
    "basket_itemsets_apriori",   # frequent 2-/3-itemsets
    "agg_count_min_sketch",      # built-in mergeable CMS + merge contract
)


def _force(df) -> int:
    """Materialize every column of every row without driver transfer."""
    from pyspark.sql import functions as F

    row = df.select(
        F.count(F.lit(1)).alias("n"),
        *[
            F.count(c).alias(f"c{i}")
            for i, c in enumerate(df.columns)
        ],
    ).collect()[0]
    return row["n"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from vector_ai_npm_spark import registry
    from vector_ai_npm_spark.session import get_spark

    spark = get_spark("vector-ai-npm-spark-bench")
    # Silence WindowExec's "No Partition Defined" WARN for the bench
    # run only: every unpartitioned window in the registry is PROVEN to
    # ride a reduced frame by the structural plan gate
    # (tests/test_plans.py::test_no_corpus_scale_unpartitioned_windows),
    # which is strictly stronger than the warning — and ~800 copies of
    # it were drowning real warnings in bench stderr (round-6 verdict
    # audit item).
    try:
        jvm = spark._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # non-log4j2 deployment: keep the warnings
    queries = registry.all_queries()
    names = [n for n in BENCH_QUERIES if n in queries]
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        names = [n for n in names if n in wanted]

    if not os.environ.get("SPARK_GRAFT_NO_WARMUP"):
        # warm the JVM (whole-stage codegen compile), the Python worker
        # pool + Arrow path (ingest_pipeline), and the Janino compile of
        # the large md5 expression trees (dedup_*) — first-run compile
        # costs 5-10s that steady-state throughput never sees
        for n in ("agg_groupby", "filter_project", "ingest_pipeline",
                  "dedup_minhash_pairs", "dedup_ngram_jaccard"):
            if n in queries:
                _force(queries[n](spark, sf_dir))

    # best-of-R per query: a single pass is hostage to GC pauses from the
    # preceding query's allocations (observed 1.4s -> 8.7s swings); r5
    # showed best-of-3 still let co-tenant noise fake a 1.76x regression
    # on tpch_q5 (best-of-5 reproduced 0.91x on the identical plan —
    # TUNING.md round-6 entry), so the default is now 5
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
    timings: dict[str, float] = {}
    for n in names:
        best = float("inf")
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            _force(queries[n](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[n] = round(best, 3)

    # pinned per-query targets (medians of prior rounds, committed):
    # vs_target makes regressions visible as a ratio instead of a guess,
    # and anything >1.5x its pin gets a loud stderr line
    targets: dict[str, float] = {}
    tpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_targets.json")
    try:
        with open(tpath) as fh:
            targets = json.load(fh).get("targets", {})
    except (OSError, ValueError):
        pass
    vs_target = {
        n: round(t / targets[n], 2)
        for n, t in timings.items()
        if targets.get(n)
    }
    regressions = {n: r for n, r in vs_target.items() if r > 1.5}
    for n, r in sorted(regressions.items(), key=lambda kv: -kv[1]):
        print(
            f"BENCH REGRESSION: {n} {timings[n]:.3f}s is {r:.2f}x its "
            f"pinned target {targets[n]:.3f}s",
            file=sys.stderr,
        )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "vs_target": vs_target,
        "regressions": regressions,
        "targets": {n: targets[n] for n in timings if n in targets},
        "sf": sf_val,
    }
    # full-precision record for the repo (committed as bench_last.json)
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "bench_last.json"), "w") as fh:
            json.dump(detail, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass

    # stdout contract: ONE parseable JSON line.  The driver keeps only
    # the last 2000 chars of stdout (BENCH_r05 proved it: a 2170-char
    # line came back with parsed:null), so the in-band line is a compact
    # 2-decimal rendering without the regressions dup, and if it would
    # still exceed the budget the vs_target entries nearest 1.0 are
    # dropped first (full detail always lives in bench_last.json).
    agg = (sum(timings[n] for n in vs_target)
           / max(sum(targets[n] for n in vs_target), 1e-9)) if vs_target else None
    line_obj = {
        "metric": detail["metric"],
        "value": round(detail["value"], 2),
        "unit": "sec",
        "queries": {n: round(t, 2) for n, t in timings.items()},
        "n_queries": len(timings),
        "n_pinned": len(vs_target),
        "vs_target_agg": round(agg, 3) if agg is not None else None,
        "vs_target_worst": (
            {n: vs_target[n]
             for n in sorted(vs_target, key=vs_target.get, reverse=True)[:5]}
            if vs_target else {}
        ),
        "regressions": regressions,
        "over_2x_gate": sum(1 for r in vs_target.values() if r > 2.0),
        "sf": sf_val,
    }
    # the driver keeps the last 2000 chars of stdout (BENCH_r10 proved
    # the full 93-entry queries map no longer fits: parsed:null).  The
    # in-band line carries aggregates + worst offenders always; the
    # per-query map is included only as long as it fits, shrunk by
    # dropping the entries nearest their pins first — the full map
    # always lives in bench_last.json.
    budget = 1900
    line = json.dumps(line_obj, separators=(",", ":"))
    if len(line) > budget:
        keep = sorted(
            timings,
            key=lambda n: abs(vs_target.get(n, 1.0) - 1.0),
            reverse=True,
        )
        while len(line) > budget and keep:
            keep.pop()
            line_obj["queries"] = {n: round(timings[n], 2) for n in keep}
            line_obj["queries_elided"] = len(timings) - len(keep)
            line = json.dumps(line_obj, separators=(",", ":"))
    print(line)
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for the headline
queries, so plan quality is reviewable without running Spark.

    python tools/dump_plans.py
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = "/root/testdata/sf0.001"

PLAN_QUERIES = (
    ("filter_project", "pushed filters + pruned schema"),
    ("agg_groupby", "partial/final hash agg, exact-decimal sums"),
    ("join_broadcast", "broadcast hash join, fact side never shuffles"),
    ("join_asof", "as-of via union + carry-forward window — zero joins"),
    ("topk_orders", "TakeOrderedAndProject global top-k"),
    ("window_rank", "WindowGroupLimit pushdown"),
    ("similarity_search_topk", "JVM-side cosine, no Python in plan"),
    ("dedup_ngram_jaccard", "inverted-index bucket-emit, no cross product"),
    ("dedup_minhash_pairs", "banded LSH candidate equi-join"),
    ("join_bucketed", "pre-bucketed scan SMJ (run with broadcast off)"),
    ("stream_session", "session_window aggregation"),
    ("ingest_pipeline", "chunk → subsplit UDF → embed UDF, one doc shuffle"),
    ("tpch_q7", "6-way join, nation pair via constraint propagation"),
    ("tpch_q21", "semi+anti correlated pair on shared derived relation"),
    ("agg_percentile_dist", "distributed exact quantiles via cum counts"),
    ("pivot_orders", "single-pass conditional-agg pivot"),
    ("sessionize", "two windows, one shuffle (gaps-and-islands)"),
    ("cdc_scd2_merge", "anti/semi/union SCD2 merge"),
    ("stream_join_interval", "interval join batch face"),
    ("text_tfidf", "tf shuffle + broadcast df/n"),
    ("tpch_q9", "widest join: filtered part broadcast + derived partsupp"),
    ("agg_sketch_distinct", "constant-size mergeable sketch state"),
    ("layout_cluster_range", "range-clustered scan, pushed range filter"),
    ("cohort_retention", "window MIN + (cohort, offset) agg — two shuffles"),
    ("window_anomaly_zscore", "decimal power sums over one window frame"),
    ("timeseries_gapfill", "post-agg calendar densification + LOCF window"),
    ("profile_table", "single scan, one Expand for multi-col distinct"),
    ("join_partition_pruned", "runtime DPP partition filter from dim side"),
    ("agg_histogram", "1-row stats broadcast into the binning pass"),
    ("concurrency_sweep", "two-level prefix sum, one tiny SinglePartition"),
    ("events_rfm", "corpus agg → user frame → two-level exact ntiles"),
    ("attribution_first_touch", "touch top-1 per user ⋈ purchases"),
    ("graph_triangles", "oriented wedge join + closing-edge probe"),
    ("graph_pagerank", "per-iteration ranks ⋈ edges on one node key"),
    ("basket_lift", "grouped-basket inline pair expansion, keyed joins"),
    ("agg_histogram_equidepth", "two-level ntile: bucket exchange + tiny carry"),
    ("orders_pareto_abc", "exact-decimal two-level cumulative share"),
    ("dq_checks", "one scan per fact; FK rides the stats scan"),
    ("table_diff", "full-outer PK join + null-safe residual"),
    ("stream_topk", "windowed count + per-window rank"),
    ("graph_jaccard_neighbors", "capped 2-path self-join (deg<=64 centers)"),
    ("join_asof_tolerance", "one user shuffle, zero joins, post-carry bound"),
    ("dedup_time_window", "WindowGroupLimit per (user,type,hour)"),
    ("embedding_hygiene", "map-only audit: zero Exchange in the plan"),
    ("text_pmi_cooccur", "type-count shuffles + broadcast unigram sides"),
    ("retrieval_fusion_rrf", "two windowed rankings over one broadcast NLJ"),
    ("sample_stratified_k", "stratum-keyed WindowGroupLimit, no global sort"),
    ("ab_test_summary", "join-free two-level aggregate, hash rides the scan"),
    ("curate_winsorize", "grouped percentiles broadcast back over the fact"),
    ("text_distinct_ngrams", "join-free distinct-gram aggregates per n"),
    ("multimodal_dhash_pairs", "banded Hamming equi-join, no all-pairs"),
    ("drift_ks_arms", "exact KS via two-level prefix, no global sort"),
    ("curate_line_dedup", "hash-only freq count + broadcast anti-join"),
    ("text_bm25", "one Generate; df/dl windows over the doc-term matrix"),
    ("eval_pass_at_k", "join-free task aggregate + k lattice"),
    ("curate_ppl_buckets", "grouped two-level ntile, broadcast stats/carry"),
    ("dq_l_diversity", "two-phase exact distinct, no Expand, no join"),
    ("events_growth_accounting", "one user window over distinct (user,day)"),
    ("window_twap", "window + agg share one (user,day) exchange"),
    ("events_trend_ols", "closed-form OLS power sums, single scan"),
    ("eval_auc_rank", "rank sums via two-level prefix + broadcast carries"),
    ("feature_target_encode_loo", "5-row category agg broadcast; fact unshuffled"),
    ("feature_hash_bucket", "vocab-keyed agg, bucket WindowGroupLimit"),
    ("text_bm25_topk_contract", "exact-division score over the matched frame; per-query rank window"),
    ("graph_link_jaccard", "capped wedge equi-join + anti-join + TakeOrdered top-k"),
    ("feature_standardize", "types-row moments broadcast; fact never shuffles"),
    ("events_autocorr", "daily frame; lag equi-join + integer folds"),
    ("eval_lift_gain", "two-level ntile deciles; cum windows on 10 rows"),
    ("attribution_time_decay", "user-equi pair SMJ; micro-ledger agg"),
    ("drift_tvd_bins", "unit-bin agg; 1-row broadcast totals"),
    ("events_interarrival", "user lag window; prefix-bucketed quantiles"),
    ("cohort_stickiness", "distinct (user,day) + 30x Generate fan-out"),
    ("events_audience_overlap", "user-keyed self-join, broadcast totals"),
    ("embedding_centroid_drift", "posexplode → (label,dim) decimal agg"),
    ("eval_regression_metrics", "join-free 1-row power-sum fold"),
    ("events_lateness_profile", "user prefix-max; bucketed quantiles"),
    ("graph_knn_curve", "edge ⋈ degree frames on node keys"),
    ("multimodal_decode_quarantine", "map-only Arrow decode+classify"),
    ("events_user_activity_audit", "TakeOrdered top-50 over user frame"),
    ("dedup_source_pair_rate", "banded pairs + broadcast source joins"),
    ("eval_kendall_tau", "joint histogram; cell-pair join, no cartesian"),
    ("ab_bootstrap_ci", "broadcast 101-rep fan-out over user frame"),
    ("text_zipf_ratio", "one tokenize Generate; vocab-bounded window"),
    ("vector_quantize_binary", "JVM sign codes; Hamming bit_count(xor)"),
    ("retrieval_late_interaction", "16 slice-cosines in codegen"),
    ("graph_pagerank_personalized", "node-keyed steps; bigint ledger"),
    ("multimodal_decode_gif", "map-only Arrow LZW roundtrip"),
    ("multimodal_webp_dims", "map-only Arrow container parse"),
    ("dq_schema_drift", "one corpus scan, one keyed aggregate"),
    ("eval_rank_rbo", "one scan vs broadcast probe; 10-row fold"),
    ("cluster_grid_density", "one scan; occupied-cell frames after"),
    # round-10 wave
    ("similarity_search_ivf_filtered",
     "predicate below the probe join; widened cell scan"),
    ("graph_ktruss", "equi-join wedge rounds; checkpointed lineage"),
    ("join_geo_radius", "cell equi-join + 9x probe fan-out, no NLJ"),
    ("stream_join_left_outer", "sort-merge LeftOuter, range residual"),
    ("events_forecast_holt", "day-frame paired-state folds, JVM-only"),
    ("er_cluster_mentions", "block-keyed pair join + min-label rounds"),
    ("multimodal_decode_webp", "map-only Arrow VP8L roundtrip"),
    ("scan_python_datasource", "Python BatchScan, filters absorbed"),
    # round-11 wave
    ("join_temporal_validity", "dim-key equi-join + validity filter"),
    ("ivm_incremental_agg", "delta agg + keyed full-outer merge"),
    ("scan_npy_embeddings", "binaryFile scan -> Arrow parse -> join"),
    ("multimodal_decode_jpeg_variants", "map-only Arrow codec audit"),
    ("udtf_table_argument", "one UDTF pass, PARTITION BY shuffle"),
)


def main() -> None:
    from vector_ai_npm_spark import registry
    from vector_ai_npm_spark.session import get_spark

    spark = get_spark("plan-dump", cpus=4, shuffle_partitions=8)
    spark.conf.set("spark.sql.maxMetadataStringLength", "120")

    out = [
        "# PLANS — headline physical plans (`explain formatted`, sf0.001)",
        "",
        "Regenerate with `python tools/dump_plans.py`. These are the plans",
        "the test suite pins (tests/test_plans.py); shapes — not sizes —",
        "are what must survive a 100 TB scale-up.",
        "",
    ]
    for name, why in PLAN_QUERIES:
        if name == "join_bucketed":
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = registry.run(name, spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        if name == "join_bucketed":
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        text = buf.getvalue()
        # keep the operator tree + the first screenful of node details
        head = text.split("\n\n")[0]
        out += [f"## {name}", "", f"*{why}*", "", "```", head, "```", ""]
    Path(__file__).resolve().parents[1].joinpath("PLANS.md").write_text(
        "\n".join(out)
    )
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()

"""The driver checks only the first 50 queries per round; registry order
is therefore a rotation schedule derived from past CORRECTNESS_r*.json
files.  Pin the three-tier sort: previously-failed first, then
never-attempted, then driver-green."""

from __future__ import annotations

import json

from vector_ai_npm_spark import registry


def test_driver_history_tiers(monkeypatch, tmp_path):
    rows = {
        "green_q": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        },
        "red_q": {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "err": "TypeError: boom",
        },
        "rows_only_q": {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": 7,
            "err": "no_oracle",
        },
        "flipped_q": {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": 7,
            "err": "no_oracle",
        },
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    monkeypatch.setattr(
        registry.Path,
        "glob",
        lambda self, pat: iter([tmp_path / "CORRECTNESS_r01.json"]),
    )
    # flipped_q has since gained an oracle: its old rows-only pass no
    # longer counts and it must be re-verified under the hash gate.
    monkeypatch.setitem(registry._ORACLES, "flipped_q", "SELECT 1")
    verified, attempted, last_green = registry._driver_history()
    assert "green_q" in verified
    assert "rows_only_q" in verified
    assert "red_q" in attempted and "red_q" not in verified
    assert "flipped_q" in attempted and "flipped_q" not in verified
    assert last_green["green_q"] == 1
    assert "red_q" not in last_green


def test_last_green_round_tracks_latest(monkeypatch, tmp_path):
    green = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "err": None,
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"old_q": green, "fresh_q": green})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({"fresh_q": green}))
    files = [tmp_path / "CORRECTNESS_r03.json", tmp_path / "CORRECTNESS_r01.json"]
    monkeypatch.setattr(registry.Path, "glob", lambda self, pat: iter(files))
    verified, _attempted, last_green = registry._driver_history()
    assert verified == {"old_q", "fresh_q"}
    assert last_green == {"old_q": 1, "fresh_q": 3}


def test_window_prioritizes_unverified():
    qs = list(registry.all_queries())
    verified, attempted, _last_green = registry._driver_history()
    window, rest = qs[:50], qs[50:]
    # No driver-green query may hold a window slot while any unverified
    # query sits outside the window.
    unverified_outside = [n for n in rest if n not in verified]
    if unverified_outside:
        assert all(n not in verified for n in window)
    # Previously-failed queries re-enter the next window immediately.
    failed = [n for n in registry.all_queries() if n in attempted and n not in verified]
    for name in failed:
        assert name in window


# The 50 names that had no driver CORRECTNESS row after round 5 (the 34
# round-5 backlog + the 16 round-6 additions).  Pinned BY NAME so later
# registrations provably cannot displace them from the round-6 window.
ROUND6_DEBT = frozenset({
    "mine_hard_negatives", "retrieval_eval_ndcg", "cluster_kmeans_assign",
    "dedup_semantic", "semdedup_recall", "jaccard_cap_recall",
    "lm_bigram_score", "tokenizer_fertility", "curate_dsir_masses",
    "curate_dsir_select", "stream_static_enrich", "stream_tws_totals",
    "stream_dedup_incremental", "multimodal_decode_png",
    "multimodal_decode_jpeg", "window_moving_median", "table_diff",
    "dq_checks", "funnel_time_to_convert", "cohort_retention",
    "events_path_ngrams", "agg_mode_per_key", "window_anomaly_zscore",
    "timeseries_gapfill", "join_bloom_filtered", "concurrency_sweep",
    "join_partition_pruned", "profile_table", "agg_histogram",
    "agg_histogram_equidepth", "recursive_cte_closure", "events_rfm",
    "attribution_first_touch", "rolling_active_users", "join_fuzzy_string",
    "agg_skyline", "agg_gini", "agg_corr_matrix", "diagnose_skew",
    "orders_pareto_abc", "events_anomaly_seasonal", "window_ewma",
    "anomaly_mad", "udtf_sentences", "udf_mapinarrow", "json_variant",
    "layout_cluster_zorder", "agg_sketch_setops", "scan_schema_evolution",
    "join_asof_nearest",
})


def test_round6_debt_window_pin():
    """Round-6 debt pin (round-5 verdict item 1): every ROUND6_DEBT name
    that still has no driver row must hold a slot in the upcoming
    first-50 window, so the driver-verification debt provably clears.
    Round-7 registrations land AFTER all of these in registration order
    (registry._load_all_modules import order), so the tier-1 FIFO sort
    keeps the debt fronted until its rows land."""
    qs = list(registry.all_queries())
    _verified, attempted, _ = registry._driver_history()
    debt = [n for n in ROUND6_DEBT if n not in attempted]
    window = set(qs[:50])
    outside = [n for n in debt if n not in window]
    assert not outside, (
        f"{len(debt)} round-6 debt queries unverified but {len(outside)} "
        f"fell outside the 50-slot window: {outside}"
    )


# Every query added in round 10 (wave 44+), pinned BY NAME (the round-9
# verdict's rotation invariant: new waves must front the next window —
# re-greening old rows is what the rest of the window is for, but a new
# query with no driver row yet is this round's debt and must clear NOW).
ROUND10_ADDITIONS = frozenset({
    "eval_kendall_tau_exact",
    "multimodal_decode_tiff",
    "multimodal_decode_jpeg_progressive",
    "similarity_search_knn_graph",
    "knn_graph_recall_contract",
    "multimodal_decode_webp",
    "similarity_search_ivf_filtered",
    "ivf_filtered_recall_contract",
    "multimodal_exif_orientation",
    "vector_quantize_rq",
    "graph_ktruss",
    "multimodal_pdf_pages",
    "scan_jsonl_gzip",
    "stream_join_left_outer",
    "scan_csv_dialect",
    "scan_python_datasource",
    "events_forecast_holt",
    "multimodal_apng_frames",
    "similarity_search_ivfrq",
    "ivfrq_recall_contract",
    "stream_checkpoint_restart",
    "join_geo_radius",
    "multimodal_wav_dims",
    "er_cluster_mentions",
    "store_time_travel_diff",
    "scan_xml",
    "xml_funcs",
    "dedup_exact_substring",
    "multimodal_mp4_dims",
    "udtf_dynamic_schema",
})


def test_round10_additions_front_the_window():
    """Every round-10 query that has no driver row yet must hold a slot
    in the upcoming 50-query window — wave-44+ additions may never sit
    behind green-tier re-verification."""
    qs = list(registry.all_queries())
    _verified, attempted, _ = registry._driver_history()
    debt = [n for n in ROUND10_ADDITIONS if n in registry._QUERIES and n not in attempted]
    window = set(qs[:50])
    outside = [n for n in debt if n not in window]
    assert not outside, (
        f"round-10 additions fell outside the 50-slot window: {outside}"
    )


def test_round10_additions_registered():
    """The pin above is vacuous if a name is misspelled — every
    ROUND10_ADDITIONS entry that claims to exist must actually be
    registered once its module lands (names registered so far)."""
    registry._load_all_modules()
    known = set(registry._QUERIES)
    landed = ROUND10_ADDITIONS & known
    assert "eval_kendall_tau_exact" in landed


# Every query added in round 11 (wave 65+), pinned BY NAME — same
# invariant as ROUND10_ADDITIONS: a new query with no driver row is this
# round's debt and must hold a slot in the upcoming 50-query window.
ROUND11_ADDITIONS = frozenset({
    "multimodal_decode_jpeg_variants",
    "vector_store_ivf_delete",
    "udtf_table_argument",
    "scan_npy_embeddings",
    "graph_scc",
    "join_temporal_validity",
    "stream_dedup_within_watermark",
    "ivm_incremental_agg",
    "eval_bleu_components",
    "graph_condensation",
    "store_manifest_acid",
    "basket_itemsets_apriori",
    "agg_count_min_sketch",
})


def test_round11_additions_front_the_window():
    qs = list(registry.all_queries())
    _verified, attempted, _ = registry._driver_history()
    debt = [
        n for n in ROUND11_ADDITIONS
        if n in registry._QUERIES and n not in attempted
    ]
    window = set(qs[:50])
    outside = [n for n in debt if n not in window]
    assert not outside, (
        f"round-11 additions fell outside the 50-slot window: {outside}"
    )


ROUND13_ADDITIONS = frozenset({
    "knn_graph_insert_contract",
    "multimodal_decode_tiff_jpeg",
})


def test_round13_additions_front_the_window():
    qs = list(registry.all_queries())
    _verified, attempted, _ = registry._driver_history()
    debt = [
        n for n in ROUND13_ADDITIONS
        if n in registry._QUERIES and n not in attempted
    ]
    window = set(qs[:50])
    outside = [n for n in debt if n not in window]
    assert not outside, (
        f"round-13 additions fell outside the 50-slot window: {outside}"
    )


def test_round13_additions_registered():
    registry._load_all_modules()
    known = set(registry._QUERIES)
    missing = ROUND13_ADDITIONS - known
    assert not missing, f"ROUND13_ADDITIONS names not registered: {missing}"


def test_round11_additions_registered():
    registry._load_all_modules()
    known = set(registry._QUERIES)
    missing = ROUND11_ADDITIONS - known
    assert not missing, f"ROUND11_ADDITIONS names not registered: {missing}"


def test_never_attempted_tier_is_fifo():
    """Within the never-attempted tier the window must fill oldest-
    registration-first: no never-attempted query may sit outside the
    window while a LATER-registered never-attempted one holds a slot.
    This is what lets new waves register without displacing old debt."""
    qs = list(registry.all_queries())
    _verified, attempted, _ = registry._driver_history()
    reg_order = {n: i for i, n in enumerate(registry._QUERIES)}
    never = [n for n in qs if n not in attempted]
    in_window = [reg_order[n] for n in never if n in set(qs[:50])]
    outside = [reg_order[n] for n in never if n not in set(qs[:50])]
    assert not in_window or not outside or max(in_window) < min(outside)


def test_rotation_is_deterministic():
    assert list(registry.all_queries()) == list(registry.all_queries())


def test_green_tier_orders_least_recently_verified_first():
    """Once every query is green, the window must not freeze: greens are
    sorted by the round of their last green row, oldest first, so the
    50-slot window cycles through the registry re-verifying stale rows."""
    qs = list(registry.all_queries())
    verified, _attempted, last_green = registry._driver_history()
    green_rounds = [last_green.get(n, 0) for n in qs if n in verified]
    assert green_rounds == sorted(green_rounds)


def test_window_rotates_off_previous_round():
    """Against the repo's real driver history: the upcoming 50-slot
    window must differ from the latest round's checked set by >= 40
    names whenever every query is green (the r4 freeze regression)."""
    import re
    from pathlib import Path

    root = Path(registry.__file__).resolve().parents[1]
    files = sorted(
        root.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"_r(\d+)", p.stem).group(1)),
    )
    if not files:
        return
    latest = set(json.loads(files[-1].read_text()))
    qs = list(registry.all_queries())
    verified, attempted, _ = registry._driver_history()
    if any(n not in verified for n in attempted) or len(verified) < len(qs):
        return  # reds / never-attempted legitimately re-front the window
    window = set(qs[:50])
    assert len(window - latest) >= 40, (
        f"window repeats {len(window & latest)} of the previous round's names"
    )


def test_rotation_covers_all_queries_within_cycle(monkeypatch, tmp_path):
    """Simulate the driver against the real registry: starting from
    all-green history, repeatedly (a) take the first-50 window, (b)
    record a green row for it at round r, (c) re-sort. Every registered
    query must be re-verified within ceil(n/50) rounds — the window
    must never freeze on a subset."""
    import math

    green = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "err": None,
    }
    rows_only = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": 1,
        "err": "no_oracle",
    }
    names = list(registry.all_queries())
    oracles = set(registry.all_oracles())
    files = []

    def fake_glob(self, pat):
        return iter(list(files))

    monkeypatch.setattr(registry.Path, "glob", fake_glob)
    # round 0: everything green at once
    f0 = tmp_path / "CORRECTNESS_r00.json"
    f0.write_text(json.dumps(
        {n: (green if n in oracles else rows_only) for n in names}
    ))
    files.append(f0)

    seen_rounds = {}
    cycle = math.ceil(len(names) / 50)
    for r in range(1, cycle + 1):
        window = list(registry.all_queries())[:50]
        for n in window:
            seen_rounds.setdefault(n, r)
        f = tmp_path / f"CORRECTNESS_r{r:02d}.json"
        f.write_text(json.dumps(
            {n: (green if n in oracles else rows_only) for n in window}
        ))
        files.append(f)
    missed = [n for n in names if n not in seen_rounds]
    assert not missed, f"{len(missed)} queries never re-verified: {missed[:5]}"

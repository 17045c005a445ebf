"""Wave-9 invariants: Markov transitions, interval-overlap join,
weighted sampling, DP counts, frontier BFS, MRL recall, bitext margin,
dynamic partition overwrite.

Oracle parity (cross-engine value equality) is covered by
test_oracle_parity.py; these tests pin the SEMANTIC invariants the
oracle can't express — probability normalization, sampling-distribution
shape, DP determinism, BFS frontier monotonicity — plus plan gates for
the shapes that must never regress to cross products.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry


def _run(spark, name, sf):
    return registry.run(name, spark, sf)


# ---------------------------------------------------------------- markov


def test_markov_rows_normalize(spark, sf_smoke):
    rows = _run(spark, "events_markov_transitions", sf_smoke).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["p"]
        assert 0.0 < r["p"] <= 1.0
    for prev, total in by_prev.items():
        assert math.isclose(total, 1.0, rel_tol=1e-12), (prev, total)


def test_markov_transition_count_conservation(spark, sf_smoke):
    from vector_ai_npm_spark.io.sources import load_table

    ev = load_table(spark, sf_smoke, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    total_transitions = (
        _run(spark, "events_markov_transitions", sf_smoke)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    # each user contributes (events - 1) transitions
    assert total_transitions == n_events - n_users


# ------------------------------------------------------- interval overlap


def test_interval_overlap_bounds_and_uniqueness(spark, sf_smoke):
    from vector_ai_npm_spark.operators.interval_ops import _SPAN_US

    df = _run(spark, "join_interval_overlap", sf_smoke)
    rows = df.collect()
    pairs = {(r["click_event_id"], r["error_event_id"]) for r in rows}
    assert len(pairs) == len(rows), "first-shared-cell rule emitted dups"
    for r in rows:
        assert 0 < r["overlap_us"] <= _SPAN_US


def test_interval_overlap_plan_no_cross_product(spark, sf_smoke):
    df = _run(spark, "join_interval_overlap", sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------ weighted sampling


def test_weighted_sample_ranks_and_determinism(spark, sf_smoke):
    a = _run(spark, "sample_weighted_topk", sf_smoke).collect()
    b = _run(spark, "sample_weighted_topk", sf_smoke).collect()
    assert sorted(r["sample_rank"] for r in a) == list(
        range(1, len(a) + 1)
    )
    assert {tuple(r) for r in a} == {tuple(r) for r in b}, "non-deterministic"
    assert all(r["n_chars"] > 0 for r in a)


def test_weighted_sample_prefers_heavy_docs(spark, sf_oracle):
    """Length-weighted E-S sampling must over-represent long documents:
    the sampled mean n_chars should exceed the corpus mean (the sampled
    mean estimates the length-BIASED mean E[L²]/E[L] > E[L])."""
    from vector_ai_npm_spark.io.sources import load_table

    sample = _run(spark, "sample_weighted_topk", sf_oracle)
    s_mean = sample.agg(F.avg("n_chars")).collect()[0][0]
    c_mean = (
        load_table(spark, sf_oracle, "documents")
        .where(F.col("n_chars") > 0)
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert s_mean > c_mean


def test_weighted_sample_plan_no_global_sort(spark, sf_smoke):
    """orderBy().limit() must plan as TakeOrderedAndProject — a global
    Sort+Exchange over the corpus would defeat the E-S design."""
    df = _run(spark, "sample_weighted_topk", sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# -------------------------------------------------------------- dp counts


def test_dp_noisy_counts_deterministic_and_calibrated(spark, sf_oracle):
    a = _run(spark, "dp_noisy_counts", sf_oracle).collect()
    b = _run(spark, "dp_noisy_counts", sf_oracle).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    # noise is two-sided geometric with eps=1: P(|X| > 40) < 1e-17 per
    # cell — compare against true counts to bound the injected noise
    from vector_ai_npm_spark.io.sources import load_table

    truth = {
        (r["event_type"], r["day"]): r["n"]
        for r in load_table(spark, sf_oracle, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    noises = [r["noisy_n"] - truth[(r["event_type"], r["day"])] for r in a]
    assert all(abs(x) <= 40 for x in noises)
    assert any(x != 0 for x in noises), "mechanism degenerated to identity"


# ------------------------------------------------------------ frontier bfs


def test_bfs_seeds_and_monotone_frontier(spark, sf_oracle):
    from vector_ai_npm_spark.operators.graph_bfs import _N_SEEDS, _ROUNDS
    from vector_ai_npm_spark.operators.graph_ops import _pagerank_sym_cached

    dist = {r["node"]: r["dist"]
            for r in _run(spark, "graph_bfs_frontier", sf_oracle).collect()}
    assert sum(1 for d in dist.values() if d == 0) == _N_SEEDS
    assert all(0 <= d <= _ROUNDS for d in dist.values())
    # every non-seed labeled node must have a neighbor one hop closer
    edges = _pagerank_sym_cached(spark, sf_oracle).collect()
    nbrs: dict[int, set[int]] = {}
    for e in edges:
        nbrs.setdefault(e["node"], set()).add(e["nbr"])
    for node, d in dist.items():
        if d > 0:
            assert any(dist.get(m) == d - 1 for m in nbrs[node]), node


# ------------------------------------------------------------- matryoshka


def test_matryoshka_recall_range(spark, sf_smoke):
    rows = _run(spark, "vector_matryoshka_recall", sf_smoke).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        # 10·recall is an integer count
        assert math.isclose(r["recall"] * 10, round(r["recall"] * 10))


# ----------------------------------------------------------------- bitext


def test_bitext_margin_is_argmax_and_unique(spark, sf_smoke):
    rows = _run(spark, "mine_bitext_margin", sf_smoke).collect()
    x_ids = [r["x_id"] for r in rows]
    assert len(set(x_ids)) == len(x_ids)
    assert all(r["margin"] > 0 for r in rows)


def test_bitext_margin_prefers_true_pair(spark):
    """Planted fixture: the hub y-vector has the highest RAW cosine to
    both x vectors, but the ratio margin must still pick each x's true
    near-parallel partner — the de-hubbing property the margin exists
    for."""
    from vector_ai_npm_spark.retrieval.bitext import margin_best_match

    x = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "x_id long, x_emb array<double>",
    )
    # true partners sit at cos 0.6 to their x; the hub sits at cos ≈ 0.7
    # to BOTH x vectors — raw cosine ranks the hub first for every x,
    # a correct margin must not (margin(x0,y1) ≈ 1.64 > margin(x0,hub)
    # ≈ 1.24, worked through in-module)
    y = spark.createDataFrame(
        [
            (1, [0.6, 0.0, 0.0, 0.8]),
            (3, [0.0, 0.6, 0.0, 0.8]),
            (9, [0.7, 0.7, 0.14, 0.0]),   # hub: close to everything
        ],
        "y_id long, y_emb array<double>",
    )
    best = {r["x_id"]: r["y_id"]
            for r in margin_best_match(x, y).collect()}
    assert best == {0: 1, 2: 3}


def test_bitext_exact_face_refuses_runaway_pairs(spark, monkeypatch):
    """The exact cross product must refuse pair counts past the guard
    (the 10x replica OOMed the driver before it existed) instead of
    attempting them."""
    import pytest

    from vector_ai_npm_spark.retrieval import bitext

    x = spark.range(40).select(
        F.col("id").alias("x_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("x_emb"),
    )
    y = spark.range(30).select(
        F.col("id").alias("y_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("y_emb"),
    )
    monkeypatch.setattr(bitext, "EXACT_MAX_PAIRS", 1000)
    with pytest.raises(ValueError, match="EXACT_MAX_PAIRS"):
        bitext.margin_best_match(x, y)


# ------------------------------------------------- partition overwrite sink


def test_partition_overwrite_only_touches_backfill_day(spark, sf_smoke):
    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.operators.sink_ops import _BACKFILL_DAY

    out = {
        str(r["day"]): r["n_rows"]
        for r in _run(spark, "sink_partition_overwrite", sf_smoke).collect()
    }
    src = {
        str(r["day"]): r["n"]
        for r in load_table(spark, sf_smoke, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(out) == set(src), "dynamic overwrite dropped a partition"
    assert out[_BACKFILL_DAY] <= src[_BACKFILL_DAY]
    for day, n in src.items():
        if day != _BACKFILL_DAY:
            assert out[day] == n, f"untouched partition {day} changed"


def test_bitext_ann_shortlist_contains_planted_twins(spark, sf_smoke):
    """The sign-LSH shortlist must (a) cap per-x candidates at the
    shortlist k and (b) contain every planted twin pair — the recall
    property that makes the mine_bitext_margin_ann oracle sound."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.retrieval.bitext import (
        _PLANT_OFFSET,
        _SHORTLIST_K,
        ann_shortlist_pairs,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    arr = F.col("embedding").cast("array<double>")
    x = emb.where(F.col("label") % 2 == 0).select(
        F.col("vec_id").alias("x_id"), arr.alias("x_emb")
    )
    twins = emb.where(F.col("label") % 2 == 0).select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("y_id"),
        F.expr(
            "concat(array(cast(embedding[0] as double) + 0.001d), "
            "slice(cast(embedding as array<double>), 2, size(embedding) - 1))"
        ).alias("y_emb"),
    )
    decoys = emb.where(F.col("label") % 2 == 1).select(
        F.col("vec_id").alias("y_id"), arr.alias("y_emb")
    )
    pairs = ann_shortlist_pairs(x, decoys.unionByName(twins))
    per_x = pairs.groupBy("x_id").count().agg(F.max("count")).first()[0]
    assert per_x <= _SHORTLIST_K
    n_x = x.count()
    caught = pairs.where(
        F.col("y_id") == F.col("x_id") + F.lit(_PLANT_OFFSET)
    ).count()
    assert caught == n_x, f"shortlist missed {n_x - caught}/{n_x} twins"


def test_bitext_ann_face_matches_exact_on_planted(spark, sf_smoke):
    from vector_ai_npm_spark import registry

    rows = registry.run("mine_bitext_margin_ann", spark, sf_smoke).collect()
    assert rows and all(r.is_planted_twin for r in rows)

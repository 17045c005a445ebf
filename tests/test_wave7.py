"""Invariant + plan gates for the round-7 wave (temporal_ops,
curation_dq, collocations, graph_kcore).  Cross-engine value equality is
covered by test_oracle_parity; these pin the semantic properties the
oracle can't see (tolerance bounds, fixpoints, planted pathologies) and
the physical plans the docstrings promise."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_ai_npm_spark import registry


def _plan(spark, name, sf_dir) -> str:
    df = registry.run(name, spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# temporal_ops
# --------------------------------------------------------------------------


def test_asof_tolerance_bound_and_coverage(spark, sf_oracle):
    """Every surviving match is genuinely within tolerance (re-derived
    against the raw events), and the bound bites both ways."""
    from vector_ai_npm_spark.io.sources import load_table

    out = registry.run("join_asof_tolerance", spark, sf_oracle)
    ev = load_table(spark, sf_oracle, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts"),
        F.col("user_id").alias("c_user"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    joined = (
        out.join(purchases, out["purchase_event_id"] == purchases["p_id"])
        .join(clicks, out["fresh_click_event_id"] == clicks["c_id"])
    )
    bad = joined.where(
        (F.col("c_user") != F.col("user_id"))
        | (F.col("c_ts") > F.col("p_ts"))
        | ((F.col("p_ts") - F.col("c_ts")) > F.expr("INTERVAL 1 DAY"))
    ).count()
    assert bad == 0
    n, matched = out.agg(
        F.count("*"), F.count("fresh_click_event_id")
    ).first()
    assert 0 < matched < n  # the bound bites in both directions


def test_asof_tolerance_single_shuffle(spark, sf_smoke):
    """One user_id exchange, no join operator at all (union-and-carry)."""
    plan = _plan(spark, "join_asof_tolerance", sf_smoke)
    assert plan.count("Exchange hashpartitioning") == 1
    for bad in ("SortMergeJoin", "BroadcastNestedLoop", "Cartesian"):
        assert bad not in plan, plan


def test_dedup_time_window_rule(spark, sf_oracle):
    """Survivors are unique per (user, type, hour) and are each group's
    minimum — re-derived independently with a groupBy."""
    out = registry.run("dedup_time_window", spark, sf_oracle)
    dupes = (
        out.groupBy(
            "user_id", "event_type", F.date_trunc("hour", "ts").alias("h")
        )
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dupes == 0
    from vector_ai_npm_spark.io.sources import load_table

    ev = load_table(spark, sf_oracle, "events")
    n_groups = (
        ev.groupBy("user_id", "event_type", F.date_trunc("hour", "ts"))
        .count()
        .count()
    )
    assert out.count() == n_groups  # exactly one survivor per group


def test_dedup_time_window_plans_group_limit(spark, sf_smoke):
    plan = _plan(spark, "dedup_time_window", sf_smoke)
    assert "WindowGroupLimit" in plan, plan


# --------------------------------------------------------------------------
# curation_dq
# --------------------------------------------------------------------------


def test_k_anonymity_flags_both_ways(spark, sf_oracle):
    out = registry.run("dq_k_anonymity", spark, sf_oracle).collect()
    flags = {r["at_risk"] for r in out}
    assert flags == {True, False}  # threshold bites without flagging all
    from vector_ai_npm_spark.operators.curation_dq import _K_ANON

    for r in out:
        assert r["at_risk"] == (r["group_n"] < _K_ANON)


def test_benford_partition_of_orders(spark, sf_oracle):
    out = registry.run("dq_benford", spark, sf_oracle).collect()
    assert {r["digit"] for r in out} <= {str(d) for d in range(1, 10)}
    from vector_ai_npm_spark.io.sources import load_table

    n_orders = load_table(spark, sf_oracle, "orders").count()
    assert sum(r["obs"] for r in out) == n_orders
    for r in out:
        assert r["chi2_term"] >= 0.0
        assert r["expected_n"] > 0.0
    # expectations are a probability distribution over observed digits
    from vector_ai_npm_spark.operators.curation_dq import _BENFORD_P

    assert math.isclose(sum(_BENFORD_P.values()), 1.0, rel_tol=1e-12)


def test_embedding_hygiene_planted_pathologies(spark):
    """The fixture is clean; plant NaN / Inf / zero / short vectors and
    check each is caught."""
    from vector_ai_npm_spark.operators.curation_dq import hygiene_frame

    rows = [
        (1, [3.0, 4.0]),
        (2, [float("nan"), 1.0]),
        (3, [float("inf"), 1.0]),
        (4, [0.0, 0.0]),
        (5, [1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in hygiene_frame(df).collect()}
    assert got[1]["l2_norm"] == 5.0 and got[1]["n_nonfinite"] == 0
    assert got[2]["n_nonfinite"] == 1
    assert got[3]["n_nonfinite"] == 1
    assert got[4]["is_zero"] and got[4]["l2_norm"] == 0.0
    assert got[5]["dim"] == 1


def test_embedding_hygiene_is_map_only(spark, sf_smoke):
    plan = _plan(spark, "embedding_hygiene", sf_smoke)
    assert "Exchange" not in plan, plan


def test_delete_cascade_contract(spark, sf_oracle):
    out = {r["table_name"]: r for r in
           registry.run("delete_cascade", spark, sf_oracle).collect()}
    for t in ("documents", "embeddings"):
        r = out[t]
        assert r["rows_before"] - r["rows_deleted"] == r["rows_after"]
        assert r["orphans_after"] == 0
        assert r["rows_deleted"] > 0  # the request set is non-empty


def test_majority_vote_properties(spark, sf_oracle):
    from vector_ai_npm_spark.io.sources import load_table

    out = registry.run("label_majority_vote", spark, sf_oracle)
    n_vecs = load_table(spark, sf_oracle, "embeddings").count()
    rows = out.collect()
    assert len(rows) == n_vecs  # exactly one decision per example
    assert len({r["vec_id"] for r in rows}) == n_vecs
    for r in rows:
        assert 0 <= r["voted_label"] <= 9
        assert 1 <= r["n_votes"] <= 3
    # with 20% corruption per annotator most votes should be unanimous
    unanimous = sum(r["unanimous"] for r in rows)
    assert unanimous > len(rows) // 2


# --------------------------------------------------------------------------
# collocations
# --------------------------------------------------------------------------


def test_pmi_topk_shape_and_ordering(spark, sf_oracle):
    rows = registry.run("text_pmi_cooccur", spark, sf_oracle).collect()
    assert len(rows) == 20
    assert len({(r["w1"], r["w2"]) for r in rows}) == 20
    lifts = [r["lift_ppm"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["c12"] >= 5
        assert r["c1"] >= r["c12"] and r["c2"] >= r["c12"]
        assert r["lift_ppm"] > 0


def test_pmi_no_cartesian(spark, sf_smoke):
    plan = _plan(spark, "text_pmi_cooccur", sf_smoke)
    # the only nested-loop is the broadcast 1-row total frame
    assert "CartesianProduct" not in plan, plan


# --------------------------------------------------------------------------
# graph_kcore
# --------------------------------------------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_kcore_fixpoint_reached(spark, sf):
    """The unrolled round count exceeds the peel depth: one extra round
    changes nothing, so the fixed unroll IS the exact k-core."""
    from vector_ai_npm_spark.operators.graph_kcore import _ROUNDS, kcore

    a = {(r["node"], r["core_deg"])
         for r in kcore(spark, sf, rounds=_ROUNDS).collect()}
    b = {(r["node"], r["core_deg"])
         for r in kcore(spark, sf, rounds=_ROUNDS + 1).collect()}
    assert a == b
    assert a  # non-trivial core at fixture scale


def test_kcore_is_subgraph_with_min_degree(spark, sf_oracle):
    """Every member's degree within the member-induced subgraph is ≥ k
    (re-derived from the raw symmetric edges, not the operator)."""
    from vector_ai_npm_spark.operators.graph_kcore import _K
    from vector_ai_npm_spark.operators.graph_ops import (
        _pagerank_sym_cached,
    )

    core = registry.run("graph_kcore", spark, sf_oracle)
    nodes = core.select("node")
    sym = _pagerank_sym_cached(spark, sf_oracle)
    induced_deg = (
        sym.join(nodes, "node", "left_semi")
        .join(nodes.withColumnRenamed("node", "nbr"), "nbr", "left_semi")
        .groupBy("node")
        .count()
    )
    assert induced_deg.where(F.col("count") < _K).count() == 0
    # and the reported core_deg equals the induced degree
    mismatch = (
        core.join(induced_deg, "node")
        .where(F.col("core_deg") != F.col("count"))
        .count()
    )
    assert mismatch == 0


# --------------------------------------------------------------------------
# multimodal dhash
# --------------------------------------------------------------------------


def test_dhash_planted_twin_recall(spark, sf_oracle):
    """Every one-pixel-perturbed twin must be recovered at Hamming <= 2
    (the perturbation can move at most two sampled gradients)."""
    from vector_ai_npm_spark.multimodal.phash import _PLANT_OFFSET

    pairs = registry.run("multimodal_dhash_pairs", spark, sf_oracle)
    planted = pairs.where(
        (F.col("asset_b") - F.col("asset_a")) == _PLANT_OFFSET
    )
    from vector_ai_npm_spark.io.sources import load_table

    n_planted_src = (
        load_table(spark, sf_oracle, "documents")
        .where("doc_id % 10 = 0")
        .count()
    )
    got = planted.collect()
    assert len(got) == n_planted_src  # 100% recall
    assert all(r["hamming"] <= 2 for r in got)


def test_dhash_pairs_has_no_false_positives(spark, sf_oracle):
    """With full-entropy (≥9×8) images the pairs output is EXACTLY the
    planted twin set — no unrelated fixture pair survives the band gate
    plus Hamming verify."""
    from vector_ai_npm_spark.multimodal.phash import _PLANT_OFFSET

    rows = registry.run("multimodal_dhash_pairs", spark, sf_oracle).collect()
    assert rows
    assert all(r["asset_b"] - r["asset_a"] == _PLANT_OFFSET for r in rows)


def test_dhash_exact_copy_is_hamming_zero(spark, sf_oracle):
    """An exact payload copy must produce the identical fingerprint."""
    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.multimodal.phash import (
        _PLANT_OFFSET,
        dhash_frame,
        media_with_plants,
    )

    docs = load_table(spark, sf_oracle, "documents").limit(20)
    base = media_with_plants(docs).where(F.col("asset_id") < _PLANT_OFFSET)
    copies = base.select(
        (F.col("asset_id") + 1_000_000_000).alias("asset_id"), "payload"
    )
    hashes = dhash_frame(base.unionByName(copies))
    a = hashes.where(F.col("asset_id") < 1_000_000_000).select(
        "asset_id", F.col("dhash").alias("da")
    )
    b = hashes.where(F.col("asset_id") >= 1_000_000_000).select(
        (F.col("asset_id") - 1_000_000_000).alias("asset_id"),
        F.col("dhash").alias("db"),
    )
    j = a.join(b, "asset_id")
    assert j.count() == 20
    assert j.where(F.col("da") != F.col("db")).count() == 0


def test_dhash_pairs_no_cartesian(spark, sf_smoke):
    plan = _plan(spark, "multimodal_dhash_pairs", sf_smoke)
    for bad in ("CartesianProduct", "BroadcastNestedLoop"):
        assert bad not in plan, plan


# --------------------------------------------------------------------------
# reference-implementation cross-checks (random graphs / event sets)
# --------------------------------------------------------------------------


def _py_kcore(edges: set[tuple[int, int]], k: int) -> dict[int, int]:
    """Sequential Batagelj-Zaveršnik peeling over an undirected edge set."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {n: len(adj[n] & alive) for n in alive}


@pytest.mark.parametrize("seed", [7, 41, 1234])
def test_kcore_matches_sequential_reference_on_random_graphs(spark, seed):
    """The distributed synchronous peel must equal sequential peeling on
    arbitrary graphs, not just the co-purchase fixture."""
    import random

    from vector_ai_npm_spark.operators.graph_kcore import _K

    rng = random.Random(seed)
    n = 60
    edges = {
        (a, b)
        for _ in range(150)
        for a, b in [sorted(rng.sample(range(n), 2))]
    }
    expected = _py_kcore(edges, _K)

    from pyspark.sql import functions as F2

    sym = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
        "node long, nbr long",
    )
    cur = sym
    for _ in range(12):  # > any peel depth at n=60
        deg = cur.groupBy("node").agg(F2.count(F2.lit(1)).alias("c"))
        alive = deg.where(F2.col("c") >= _K).select("node").localCheckpoint()
        cur = (
            cur.join(alive, "node", "left_semi")
            .join(alive.withColumnRenamed("node", "nbr"), "nbr", "left_semi")
            .select("node", "nbr")
            .localCheckpoint()
        )
    got = {
        r["node"]: r["core_deg"]
        for r in cur.groupBy("node")
        .agg(F2.count(F2.lit(1)).alias("core_deg"))
        .where(F2.col("core_deg") >= _K)
        .collect()
    }
    assert got == expected


def test_dedup_time_window_matches_bruteforce_reference(spark, sf_smoke):
    """Survivor set equals a driver-side brute-force of the same rule."""
    from vector_ai_npm_spark.io.sources import load_table

    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    rows = ev.collect()
    best: dict[tuple, tuple] = {}
    for r in rows:
        key = (r["user_id"], r["event_type"],
               r["ts"].replace(minute=0, second=0, microsecond=0))
        cand = (r["ts"], r["event_id"])
        if key not in best or cand < best[key]:
            best[key] = cand
    expected = {eid for _, eid in best.values()}
    got = {
        r["event_id"]
        for r in registry.run("dedup_time_window", spark, sf_smoke).collect()
    }
    assert got == expected


# --------------------------------------------------------------------------
# LPA / RRF / whitening / stratified sampling
# --------------------------------------------------------------------------


def _py_lpa(edges: set[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Sequential mirror of the deterministic synchronous LPA."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n in adj:
            tally: dict[int, int] = {}
            for nb in adj[n]:
                tally[labels[nb]] = tally.get(labels[nb], 0) + 1
            nxt[n] = min(tally, key=lambda lb: (-tally[lb], lb))
        labels = nxt
    return labels


@pytest.mark.parametrize("seed", [3, 99])
def test_lpa_matches_sequential_reference(spark, seed):
    import random

    from pyspark.sql import functions as F2

    rng = random.Random(seed)
    n = 40
    edges = {
        (a, b)
        for _ in range(100)
        for a, b in [sorted(rng.sample(range(n), 2))]
    }
    expected = _py_lpa(edges, 3)
    sym = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
        "node long, nbr long",
    )
    labels = sym.select("node").distinct().withColumn("label", F2.col("node"))
    from pyspark.sql import Window as W2

    for _ in range(3):
        nbr_labels = sym.join(
            labels.withColumnRenamed("node", "nbr"), "nbr"
        ).select("node", "label")
        tallies = nbr_labels.groupBy("node", "label").agg(
            F2.count(F2.lit(1)).alias("c")
        )
        w = W2.partitionBy("node").orderBy(F2.desc("c"), F2.col("label"))
        labels = (
            tallies.withColumn("rn", F2.row_number().over(w))
            .where(F2.col("rn") == 1)
            .select("node", "label")
        )
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got == expected


def test_lpa_labels_every_node_once(spark, sf_oracle):
    out = registry.run("graph_community_lpa", spark, sf_oracle)
    rows = out.collect()
    assert len(rows) == len({r["node"] for r in rows})
    n_comm = len({r["community"] for r in rows})
    assert 1 < n_comm < len(rows)  # neither frozen nor fully collapsed


def test_rrf_self_match_ranks_first(spark, sf_oracle):
    """A query vector is its own nearest neighbor under BOTH rankers, so
    it must fuse at rank 1 with the maximal possible score."""
    out = registry.run("retrieval_fusion_rrf", spark, sf_oracle).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["q_vec_id"], []).append(r)
    assert set(by_q) == {0, 7, 42}
    for q, rows in by_q.items():
        assert len(rows) == 10
        top = min(rows, key=lambda r: r["fused_rank"])
        assert top["vec_id"] == q
        assert top["rrf_score"] == 2 * (1000000 // 61)


def test_vector_whiten_contract_all_green(spark, sf_oracle):
    rows = registry.run("vector_whiten", spark, sf_oracle).collect()
    assert {r["scope"] for r in rows} == {
        "rows_preserved", "whitened_dim", "unit_variance",
        "decorrelated", "basis_scaled",
    }
    assert all(r["ok"] for r in rows)


def test_stratified_sample_exact_k_per_stratum(spark, sf_oracle):
    from vector_ai_npm_spark.operators.curation_dq import _STRAT_K

    out = registry.run("sample_stratified_k", spark, sf_oracle)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert set(counts) == {"de", "en", "es", "fr", "zh"}
    assert all(c == _STRAT_K for c in counts.values())
    # deterministic: same draw every run
    again = registry.run("sample_stratified_k", spark, sf_oracle)
    assert {(r["lang"], r["doc_id"]) for r in out.collect()} == {
        (r["lang"], r["doc_id"]) for r in again.collect()
    }


# --------------------------------------------------------------------------
# experimentation / winsorization / diversity
# --------------------------------------------------------------------------


def test_ab_test_partitions_users(spark, sf_oracle):
    from vector_ai_npm_spark.io.sources import load_table

    rows = {r["arm"]: r for r in
            registry.run("ab_test_summary", spark, sf_oracle).collect()}
    assert set(rows) == {"control", "treatment"}
    n_users = (
        load_table(spark, sf_oracle, "events")
        .select("user_id").distinct().count()
    )
    assert rows["control"]["n_users"] + rows["treatment"]["n_users"] == n_users
    for r in rows.values():
        assert 0 <= r["n_converters"] <= r["n_users"]
        assert 0.0 <= r["conversion_rate"] <= 1.0
        # hash split should be roughly balanced, not degenerate
        assert r["n_users"] > n_users // 4


def test_winsorize_bounds_and_preservation(spark, sf_oracle):
    out = registry.run("curate_winsorize", spark, sf_oracle)
    from vector_ai_npm_spark.io.sources import load_table

    assert out.count() == load_table(spark, sf_oracle, "events").count()
    # clamped values sit exactly at a percentile bound; others unchanged
    bad = out.where(
        (~F.col("clamped") & (F.col("value") != F.col("value_winsorized")))
        | (F.col("clamped") & (F.col("value") == F.col("value_winsorized")))
    ).count()
    assert bad == 0
    frac = out.where("clamped").count() / out.count()
    assert 0.0 < frac <= 0.03  # ~2% tails by construction


def test_distinct_ngrams_shape(spark, sf_oracle):
    rows = registry.run("text_distinct_ngrams", spark, sf_oracle).collect()
    langs = {"de", "en", "es", "fr", "zh"}
    assert {(r["lang"], r["n"]) for r in rows} == {
        (lg, n) for lg in langs for n in (1, 2)
    }
    for r in rows:
        assert 0 < r["distinct_n"] <= r["total_n"]
        assert 0.0 < r["distinct_ratio"] <= 1.0
    # bigrams are strictly more diverse than unigrams on word salad
    by = {(r["lang"], r["n"]): r["distinct_ratio"] for r in rows}
    for lg in langs:
        assert by[(lg, 2)] > by[(lg, 1)]

"""Near-dup invariants: LSH candidate generation must recall the exact
high-Jaccard pairs (SURVEY §5.2)."""

from __future__ import annotations

from vector_ai_npm_spark import registry


def _pairs(df, a="doc_id_a", b="doc_id_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_pairs_recall_exact_jaccard(spark, sf_smoke):
    exact = _pairs(registry.run("dedup_ngram_jaccard", spark, sf_smoke))
    cand = _pairs(registry.run("dedup_minhash_pairs", spark, sf_smoke))
    if not exact:
        return  # nothing to recall at this SF
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.8, f"banded-minhash recall {recall:.2f} < 0.8"


def test_mllib_lsh_runs_and_orients_pairs(spark, sf_smoke):
    rows = registry.run("dedup_near_lsh", spark, sf_smoke).collect()
    assert all(r.doc_id_a < r.doc_id_b for r in rows)
    assert all(0.0 <= r.jaccard_dist <= 0.6 for r in rows)


def test_embedding_router_threshold_decision(spark, sf_smoke):
    """mode="auto" must pick LSH at production thresholds and exact below
    the soundness boundary — pinned by plan shape: the LSH path contains
    the sign-LSH band columns, the exact path a salted grid join and NO
    LSH nodes."""
    from vector_ai_npm_spark.dedup.embedding_router import (
        LSH_MIN_THRESHOLD,
        embedding_dedup_pairs,
    )
    from vector_ai_npm_spark.io.sources import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    lsh_plan = embedding_dedup_pairs(
        emb, 0.95, mode="auto"
    )._jdf.queryExecution().analyzed().toString()
    exact_plan = embedding_dedup_pairs(
        emb, 0.4, mode="auto"
    )._jdf.queryExecution().analyzed().toString()
    assert "lsh_sig" in lsh_plan
    assert "lsh_sig" not in exact_plan
    assert 0.0 < LSH_MIN_THRESHOLD < 0.95


def test_embedding_ann_recall_is_total_on_planted_dups(spark, sf_smoke):
    """The LSH-pruned path must find EVERY planted near-dup pair (recall
    1.0, not ≥0.9) and nothing else — this is what makes
    dedup_embedding_ann oracle-checkable despite approximate candidates."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.dedup.ann_queries import PLANT_OFFSET
    from vector_ai_npm_spark.io.sources import load_table

    got = _pairs(
        registry.run("dedup_embedding_ann", spark, sf_smoke),
        a="vec_id_a",
        b="vec_id_b",
    )
    ids = [
        r.vec_id
        for r in load_table(spark, sf_smoke, "embeddings")
        .select("vec_id")
        .collect()
    ]
    want = {(i, i + PLANT_OFFSET) for i in ids}
    assert got == want


def test_embedding_exact_and_lsh_agree_at_high_threshold(spark, sf_smoke):
    """On the planted corpus the two routes are interchangeable at 0.95:
    same pairs, same (rounded) cosines."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.dedup.ann_queries import planted_corpus
    from vector_ai_npm_spark.dedup.embedding_router import embedding_dedup_pairs

    corpus = planted_corpus(spark, sf_smoke)
    def norm(df):
        return {
            (r.vec_id_a, r.vec_id_b, round(r.cosine, 6)) for r in df.collect()
        }

    assert norm(embedding_dedup_pairs(corpus, 0.95, mode="lsh")) == norm(
        embedding_dedup_pairs(corpus, 0.95, mode="exact")
    )


def test_choose_mode_decision_table():
    """The auto route must be size-capped: the O(n²/block) exact face is
    unreachable above EXACT_MAX_ROWS no matter the threshold."""
    from vector_ai_npm_spark.dedup.embedding_router import (
        EXACT_MAX_ROWS,
        choose_mode,
    )

    assert choose_mode(0.95, 10) == "lsh"
    assert choose_mode(0.95, 10**9) == "lsh"
    assert choose_mode(0.7, 10) == "lsh"
    assert choose_mode(0.4, 10) == "exact"
    assert choose_mode(0.4, EXACT_MAX_ROWS) == "exact"
    assert choose_mode(0.4, EXACT_MAX_ROWS + 1) == "lsh"
    assert choose_mode(0.0, 10**9) == "lsh"


def test_collapse_exact_duplicates_classes(spark):
    """B identical vectors collapse to one representative (min id) with
    the class size recorded; distinct vectors stay singletons."""
    from vector_ai_npm_spark.dedup.embedding_router import (
        collapse_exact_duplicates,
    )

    rows = [(i, "x", [1.0, 2.0, 3.0]) for i in range(5)] + [
        (10, "x", [4.0, 5.0, 6.0]),
        (11, "y", [1.0, 2.0, 3.0]),  # same value, different block
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    reps, members = collapse_exact_duplicates(df)
    got = {
        (r.vec_id, r.label, r._csize) for r in reps.collect()
    }
    assert got == {(0, "x", 5), (10, "x", 1), (11, "y", 1)}
    assert members.count() == 7


def test_lsh_collapse_matches_exact_with_planted_dup_class(spark):
    """With a planted exact-duplicate class (B=30) the collapsed LSH
    route must emit the identical pair set + cosines as the exact grid
    join: C(B,2) intra pairs plus every cross near-dup pair."""
    import numpy as np

    from vector_ai_npm_spark.dedup.embedding_router import (
        embedding_dedup_pairs,
    )

    rng = np.random.RandomState(7)
    base = rng.normal(size=(40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, "x", [float(v) for v in base[i]]) for i in range(40)]
    # class of 30 exact copies of vector 0 (ids 100..129)
    rows += [(100 + j, "x", [float(v) for v in base[0]]) for j in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])

    def norm(out):
        return {
            (r.vec_id_a, r.vec_id_b, round(r.cosine, 9)) for r in out.collect()
        }

    lsh = norm(embedding_dedup_pairs(df, 0.95, mode="lsh", bits=12))
    exact = norm(embedding_dedup_pairs(df, 0.95, mode="exact"))
    assert lsh == exact
    # the 30-copy class alone contributes C(31,2) pairs (vec 0 + 30 copies)
    assert len([p for p in lsh if p[2] >= 0.999999]) >= 31 * 30 // 2


def test_exact_dedup_flags_injected_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other text")], ["doc_id", "text"]
    )
    from pyspark.sql import Window, functions as F

    h = F.md5("text")
    keeper = F.min("doc_id").over(Window.partitionBy(h))
    out = {r.doc_id: r.is_dup for r in df.select(
        "doc_id", (F.col("doc_id") != keeper).alias("is_dup")).collect()}
    assert out == {1: False, 2: True, 3: False}


def test_keep_best_exactly_one_keeper_per_component(spark, sf_smoke):
    rows = registry.run("dedup_keep_best", spark, sf_smoke).collect()
    keepers = {}
    for r in rows:
        keepers.setdefault(r.component_id, []).append(r)
    for cid, members in keepers.items():
        kept = [r for r in members if r.keep_best]
        assert len(kept) == 1, (cid, members)
        # the keeper is the longest (min-id tiebreak)
        best = max(members, key=lambda r: (r.n_tokens, -r.doc_id))
        assert kept[0].doc_id == best.doc_id


def test_split_train_val_proportions_and_determinism(spark, sf_smoke):
    a = {r.doc_id: r.split for r in registry.run(
        "curate_split_train_val", spark, sf_smoke).collect()}
    b = {r.doc_id: r.split for r in registry.run(
        "curate_split_train_val", spark, sf_smoke).collect()}
    assert a == b, "split must be deterministic"
    n = len(a)
    from collections import Counter
    c = Counter(a.values())
    assert set(c) <= {"train", "val", "test"}
    assert c["train"] / n > 0.9
    assert 0 < c["val"] / n < 0.06 and 0 < c["test"] / n < 0.06

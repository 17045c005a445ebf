"""A7/B9 invariants: self-match at 1.0, threshold respected, and the
LSH-pruned path recalls ≥0.9 of the exact top-k (SURVEY §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.retrieval.lsh import ann_similarity_join
from vector_ai_npm_spark.retrieval.search import similarity_join, similarity_search_topk


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    return load_table(spark, sf_smoke, "embeddings").cache()


def test_self_match_ranks_first(spark, emb):
    qvec = list(emb.where("vec_id = 7").first()["embedding"])
    top = similarity_search_topk(emb, qvec, threshold=0.0, k=5).collect()
    assert top[0]["vec_id"] == 7
    assert top[0]["similarity"] == pytest.approx(1.0, abs=1e-9)
    sims = [r["similarity"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_threshold_filters(spark, emb):
    qvec = list(emb.where("vec_id = 7").first()["embedding"])
    hits = similarity_search_topk(emb, qvec, threshold=0.99, k=100).collect()
    assert all(r["similarity"] >= 0.99 for r in hits)


def test_lsh_recall_vs_exact(spark, emb):
    queries = emb.where(F.col("vec_id").isin(0, 7, 42)).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    exact = {
        (r["q_vec_id"], r["vec_id"])
        for r in similarity_join(queries, emb, k=5).collect()
    }
    approx = {
        (r["q_vec_id"], r["vec_id"])
        for r in ann_similarity_join(queries, emb, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} < 0.9 (exact={exact}, approx={approx})"


def test_ivf_recall_vs_exact(spark, emb):
    from vector_ai_npm_spark.retrieval.ivf import ivf_similarity_join

    queries = emb.where(F.col("vec_id").isin(0, 7, 42)).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    exact = {
        (r["q_vec_id"], r["vec_id"])
        for r in similarity_join(queries, emb, k=5).collect()
    }
    # full probe (nprobe == nlist) must EQUAL brute force — proves the
    # cell-probe machinery loses nothing when it scans everything
    full = {
        (r["q_vec_id"], r["vec_id"])
        for r in ivf_similarity_join(queries, emb, k=5, nlist=8, nprobe=8).collect()
    }
    assert full == exact, "IVF with full probe must match exact top-k"
    # half probe: the fixture vectors are uniform-random (no cluster
    # structure — the provably ANN-hostile case; observed ≈0.73 here,
    # where a clustered corpus gives 0.9+). The floor guards against the
    # probe logic degrading to chance (4/8 cells ⇒ ~0.5 at random).
    half = {
        (r["q_vec_id"], r["vec_id"])
        for r in ivf_similarity_join(queries, emb, k=5, nlist=8, nprobe=4).collect()
    }
    recall = len(exact & half) / len(exact)
    assert recall >= 0.65, f"IVF half-probe recall {recall:.2f} < 0.65"


def test_ivf_store_partition_pruning_and_recall(spark, sf_oracle, tmp_path):
    """The persisted IVF layout must (a) prune unprobed cell directories
    at the SCAN (PartitionFilters on cell_id), and (b) keep ≥0.8 recall
    vs the exact top-k at nprobe=nlist/2."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.retrieval.search import similarity_search_topk
    from vector_ai_npm_spark.retrieval.store import (
        persist_ivf_store,
        search_ivf_store,
    )

    emb = load_table(spark, sf_oracle, "embeddings")
    qvec = list(emb.where(F.col("vec_id") == 7).select("embedding").first()[0])
    store_dir = str(tmp_path / "ivf")
    persist_ivf_store(emb, store_dir, nlist=8)

    hits = search_ivf_store(spark, store_dir, qvec, k=5, nprobe=4)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell_id" in plan, plan

    got = {r.vec_id for r in hits.collect()}
    exact = {
        r.vec_id
        for r in similarity_search_topk(
            emb.select("vec_id", "embedding"), qvec, threshold=-1.0, k=5
        ).collect()
    }
    assert 7 in got, "self-match must be found (query cell always probed)"
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, f"recall {recall} too low: {got} vs {exact}"


def test_bucketed_store_zero_exchange_fetch(spark, sf_oracle):
    """Id-hydration on the bucketed layout: when BOTH sides are bucketed
    on vec_id with equal bucket counts, the join plans with zero
    Exchange nodes."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.retrieval.store import (
        fetch_by_ids_bucketed,
        persist_bucketed_store,
    )

    import tempfile

    # fresh LOCATION per run: the default warehouse dir outlives the
    # in-memory catalog, and saveAsTable refuses a pre-existing location
    spark.sql(
        "CREATE DATABASE IF NOT EXISTS vstore LOCATION "
        f"'{tempfile.mkdtemp(prefix='vstore_wh_')}'"
    )
    emb = load_table(spark, sf_oracle, "embeddings")
    persist_bucketed_store(emb, "vstore.emb_b", n_buckets=4)
    persist_bucketed_store(
        emb.select("vec_id").where(F.col("vec_id") % 5 == 0),
        "vstore.ids_b",
        n_buckets=4,
    )
    # fixture scale auto-broadcasts the id side; disable to expose the
    # bucketed path a 100 TB id-set hydration would take
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = fetch_by_ids_bucketed(
            spark, "vstore.emb_b", spark.table("vstore.ids_b")
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" not in plan, plan
    assert plan.count("Bucketed: true") == 2, plan
    n = out.count()
    assert n == emb.where(F.col("vec_id") % 5 == 0).count()


def test_mmr_skips_near_duplicate(spark):
    """Planted case: candidates A≈B (near-identical, both highly
    relevant) and C (less relevant, diverse). Pure relevance ranks
    A,B,C; MMR at λ=0.5 must rank A,C,B — the redundancy penalty has
    to defer the near-duplicate."""
    from vector_ai_npm_spark.retrieval.mmr import mmr_rerank

    store = spark.createDataFrame(
        [
            (1, [0.99, 0.10, 0.00]),   # A: top relevance
            (2, [0.98, 0.12, 0.00]),   # B: near-duplicate of A
            (3, [0.60, 0.00, 0.80]),   # C: diverse
        ],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0])], "q_vec_id long, q_embedding array<float>"
    )
    out = mmr_rerank(queries, store, k=3, k_candidates=3, lam=0.5)
    picks = [
        r.vec_id for r in out.orderBy("mmr_rank").collect()
    ]
    assert picks == [1, 3, 2], picks


def test_mmr_lambda1_equals_topk(spark, sf_oracle):
    """λ=1 must reproduce the exact top-k ordering exactly (the same
    gate the driver pins via mmr_contract, asserted directly here)."""
    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.retrieval.mmr import mmr_rerank
    from vector_ai_npm_spark.retrieval.search import similarity_join

    emb = load_table(spark, sf_oracle, "embeddings")
    queries = emb.where(F.col("vec_id").isin(0, 7, 42)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    mmr = mmr_rerank(queries, emb, k=5, k_candidates=20, lam=1.0)
    exact = similarity_join(queries, emb, k=5, threshold=-1.0)
    got = {
        (r.q_vec_id, r.mmr_rank): r.vec_id
        for r in mmr.collect()
    }
    want = {(r.q_vec_id, r.rank): r.vec_id for r in exact.collect()}
    assert got == want


def test_pq_clustered_reconstruction_and_adc(spark):
    """On clusterable data PQ must be near-lossless: 8 tight clusters
    in 64-dim (within ksub=16 codebook capacity per subspace) → recon
    cosine ≥ 0.95, and ADC must find each query's true neighbors."""
    import numpy as np

    from vector_ai_npm_spark.retrieval.pq import (
        pq_adc_search,
        pq_encode,
        train_pq,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(8, 64) * 5.0
    rows = []
    for i in range(400):
        c = centers[i % 8]
        rows.append((i, [float(x) for x in c + rng.randn(64) * 0.05]))
    store = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    books = train_pq(store, m=8, ksub=16, seed=1)
    enc = pq_encode(store, books)
    recon = enc.agg(F.min("recon_cos")).collect()[0][0]
    assert recon >= 0.95, recon

    # ADC must retrieve the query's own cluster (vecs ≡ 0 mod 8)
    q = rows[0][1]
    hits = [r.vec_id for r in pq_adc_search(enc, books, q, k=5).collect()]
    assert hits[0] == 0, hits
    assert all(h % 8 == 0 for h in hits), hits  # all from cluster 0


def test_pq_encoding_deterministic(spark, sf_oracle):
    """Same store + seed → identical codebooks and identical codes."""
    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.retrieval.pq import pq_encode, train_pq

    emb = load_table(spark, sf_oracle, "embeddings")
    b1 = train_pq(emb, m=8, ksub=16)
    b2 = train_pq(emb, m=8, ksub=16)
    import numpy as np

    assert np.array_equal(b1, b2)
    c1 = {r.vec_id: r.codes for r in pq_encode(emb, b1).collect()}
    c2 = {r.vec_id: r.codes for r in pq_encode(emb, b2).collect()}
    assert c1 == c2


def test_hard_negatives_exclude_anchor_label(spark, sf_oracle):
    """Hard-negative mining: every mined row crosses labels, ranks are
    dense 1..3 per anchor, and similarity is non-increasing in rank."""
    from vector_ai_npm_spark import registry

    rows = registry.run("mine_hard_negatives", spark, sf_oracle).collect()
    by_q = {}
    for r in rows:
        assert r.neg_label != r.q_label
        by_q.setdefault(r.q_vec_id, []).append(r)
    assert len(by_q) == 3
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3]
        sims = [r.similarity for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_opq_eigenvalue_allocation_balances_products():
    """Ge et al. §4: the allocation is a valid permutation, each bucket
    gets exactly dim/m directions, and the per-bucket log-eigenvalue-
    product spread never exceeds the naive sorted split's spread."""
    import numpy as np

    from vector_ai_npm_spark.retrieval.opq import eigenvalue_allocation

    rng = np.random.RandomState(3)
    for dim, m in ((64, 8), (16, 4), (8, 2)):
        ev = rng.gamma(2.0, 1.0, size=dim)
        perm = eigenvalue_allocation(ev, m)
        assert sorted(perm) == list(range(dim))
        dsub = dim // m
        lg = np.log(ev)
        sums = lg[perm].reshape(m, dsub).sum(axis=1)
        naive = np.sort(lg)[::-1].reshape(m, dsub).sum(axis=1)
        assert sums.max() - sums.min() <= naive.max() - naive.min() + 1e-12


def test_opq_rotation_is_orthogonal_and_norm_preserving(spark, sf_oracle):
    import numpy as np

    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.retrieval.opq import (
        opq_rotate,
        train_opq_rotation,
    )

    emb = load_table(spark, sf_oracle, "embeddings")
    R = train_opq_rotation(emb, m=8)
    assert np.abs(R.T @ R - np.eye(R.shape[0])).max() <= 1e-9
    rot = opq_rotate(emb, R).select(
        "vec_id", F.col("embedding").alias("r")
    ).join(
        load_table(spark, sf_oracle, "embeddings").select(
            "vec_id", "embedding"
        ),
        "vec_id",
    )
    norm2 = lambda c: F.aggregate(  # noqa: E731
        F.col(c), F.lit(0.0), lambda a, x: a + x * x
    )
    bad = rot.where(
        F.abs(norm2("r") - norm2("embedding")) > 1e-6
    ).count()
    assert bad == 0


def test_opq_queries_and_contract(spark, sf_oracle):
    """similarity_search_opq puts the query's own row at rank 1 and
    opq_recall passes its DuckDB oracle (all booleans TRUE)."""
    from oracle_harness import compare

    from vector_ai_npm_spark import registry

    rows = registry.run("similarity_search_opq", spark, sf_oracle).collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    assert rows[0].vec_id == 7 and rows[0].similarity == 1.0
    sql = registry.all_oracles()["opq_recall"]
    assert compare(spark, "opq_recall", sql, sf_oracle) == []


def test_knn_graph_insert_links_and_finds(spark, sf_smoke):
    """insert_knn_graph (r13): a held-out vector incrementally linked
    into a built graph must (a) receive out-edges whose top entry is
    its true nearest existing neighbor, (b) be bidirectionally linked,
    and (c) come back at rank 1 when beam-searched as its own query —
    the freshness property the contract face pins at fixture scale."""
    from vector_ai_npm_spark.retrieval.knn_graph import (
        _KG,
        build_knn_graph,
        insert_knn_graph,
        knn_graph_search,
        scaled_build_params,
        scaled_rounds,
        scaled_search_params,
    )
    from vector_ai_npm_spark.retrieval.search import similarity_join

    emb = load_table(spark, sf_smoke, "embeddings")
    held = emb.where(F.col("vec_id") == 7)
    rest = emb.where(F.col("vec_id") != 7)
    n = rest.count()
    graph = build_knn_graph(rest, k=_KG, **scaled_build_params(n))
    g2 = insert_knn_graph(graph, rest, held, k=_KG).localCheckpoint()
    out = {r.dst for r in g2.where(F.col("src") == 7).collect()}
    ins = {r.src for r in g2.where(F.col("dst") == 7).collect()}
    assert out and ins == out  # bidirectional
    # top out-edge = true nearest existing neighbor (search-based
    # acquisition at the scaled budget recovers rank-1 here)
    q = held.select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    true_top = (
        similarity_join(q, rest, k=1, threshold=-1.0)
        .collect()[0]["vec_id"]
    )
    best = (
        g2.where(F.col("src") == 7)
        .orderBy(F.col("sim").desc(), "dst")
        .first()["dst"]
    )
    assert best == true_top
    beam, entries, _ = scaled_search_params(n)
    hits = knn_graph_search(
        q, rest.unionByName(held), g2, k=5, beam=beam,
        rounds=scaled_rounds(n), n_entries=entries,
    )
    top1 = hits.where(F.col("rank") == 1).collect()[0]
    assert top1["vec_id"] == 7 and top1["similarity"] == pytest.approx(1.0)


def test_probe_ranking_replica_matches_spark(spark, sf_oracle, tmp_path):
    """probe_cells_for's driver-side ranking (r14) must reproduce the
    original Spark ranking bit-for-bit: same cosine fold order, same
    float32 narrowing of the query, same (sim DESC, cell_id ASC) order
    — compared over the FULL permutation (nprobe = nlist), not just the
    probed prefix."""
    from vector_ai_npm_spark.functions.vectors import cosine_similarity
    from vector_ai_npm_spark.retrieval import store as st

    emb = load_table(spark, sf_oracle, "embeddings")
    sd = str(tmp_path / "probe_store")
    st.persist_ivf_store(emb, sd, nlist=8)
    matrix = st._frozen_centroid_matrix(spark, sd)
    qvecs = [list(r[0]) for r in emb.select("embedding").take(5)]
    qvecs.append(list(matrix[3]))  # a centroid itself: sim-1.0 plateau
    centroids = spark.read.parquet(f"{sd}/centroids")
    for q in qvecs:
        py = st._py_rank_cells(matrix, q, len(matrix))
        qc = F.lit(q).cast("array<float>")
        ranked = centroids.select(
            "cell_id", cosine_similarity(F.col("centroid"), qc).alias("sim")
        ).orderBy(F.col("sim").desc(), "cell_id")
        jvm = [r.cell_id for r in ranked.take(len(matrix))]
        assert py == jvm
    # degenerate inputs must refuse (caller falls back to Spark)
    assert st._py_rank_cells(matrix, [0.0] * len(matrix[0]), 4) is None
    assert st._py_rank_cells(matrix, [1.0], 4) is None


def test_centroid_memo_invalidates_on_rewrite(spark, sf_oracle, tmp_path):
    """The frozen-matrix memo is keyed on the side file's identity: a
    store rebuild (overwrite) must miss the memo and serve the NEW
    centroids, never the stale matrix."""
    from vector_ai_npm_spark.retrieval import store as st

    emb = load_table(spark, sf_oracle, "embeddings")
    sd = str(tmp_path / "memo_store")
    st.persist_ivf_store(emb, sd, nlist=8)
    k1 = st._centroid_cache_key(sd)
    m1 = st._frozen_centroid_matrix(spark, sd)
    assert len(m1) == 8
    st.persist_ivf_store(emb, sd, nlist=4)
    k2 = st._centroid_cache_key(sd)
    assert k1 != k2
    m2 = st._frozen_centroid_matrix(spark, sd)
    assert len(m2) == 4
    # and the memoized value round-trips the parquet exactly
    rows = (
        spark.read.parquet(f"{sd}/centroids").orderBy("cell_id").collect()
    )
    assert m2 == [list(r.centroid) for r in rows]

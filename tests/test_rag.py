"""A13 end-to-end pipeline semantics (SURVEY §5.3-5.4): the golden
pipeline over literal MDX, preserving the reference's metadata quirks."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from vector_ai_npm_spark.engine import EngineConfig, VectorEngine, validate_identifier
from vector_ai_npm_spark.rag.pipeline import ingest_pipeline, llm_answer_stub


@pytest.fixture(scope="module")
def mdx_docs(spark):
    big_section = " ".join(f"tok{i}" for i in range(80))  # ~480 chars
    return spark.createDataFrame(
        [
            (1, "## Context\nsmall ctx\n## Body\n" + big_section),
            (2, "## Intro\nnot valid\n## Body\nxxx"),  # rejected by A2
            (3, "## Context\nanother ctx\n## Tail\nshort content"),
        ],
        ["doc_id", "mdx"],
    )


def test_ingest_pipeline_end_to_end(spark, mdx_docs):
    out = ingest_pipeline(mdx_docs, EngineConfig(chunk_size=120, chunk_overlap=30))
    rows = out.collect()
    assert rows, "pipeline produced no rows"
    # invalid doc 2 filtered out (A2)
    assert {r.doc_id for r in rows} == {1, 3}
    # oversized Body of doc 1 was sub-split, all sub-chunks share chunk_id (A3 quirk)
    body = [r for r in rows if r.doc_id == 1 and r.chunk_id == 2]
    assert len(body) > 1
    assert all(len(r.content) <= 120 for r in body)
    assert all(r.metadata.chunkId == 2 for r in body)
    # newlines flattened in sub-chunks (ref :244)
    assert all("\n" not in r.content for r in body)
    # totalChunks counts post-split rows per doc (A4)
    per_doc = {r.doc_id for r in rows}
    for d in per_doc:
        doc_rows = [r for r in rows if r.doc_id == d]
        assert all(r.metadata.totalChunks == len(doc_rows) for r in doc_rows)
    # metadata.context = parent chunk's own pre-split content (ref :233)
    assert all(r.metadata.context.startswith(body[0].content[:10]) for r in body)
    # embeddings present with the configured dim
    assert all(len(r.embedding) == 64 for r in rows)
    # metadata JSON round-trips
    m = json.loads(rows[0].metadata_json)
    assert set(m) >= {"header", "chunkId", "totalChunks", "context"}


def test_engine_facade(spark, mdx_docs):
    eng = VectorEngine(spark, EngineConfig(chunk_size=120, chunk_overlap=30))
    out = eng.ingest(mdx_docs)
    assert out.count() > 0


def test_llm_stub_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "# Question: q\n# Context: ## Chunk 1\n### Context\nc\n### Content\nanswer line\nmore")],
        ["i", "prompt"],
    )
    out1 = df.select(llm_answer_stub()(F.col("prompt")).alias("a")).first().a
    assert out1 == "ANSWER: answer line"


def test_identifier_validation_blocks_injection():
    validate_identifier("my_table")
    with pytest.raises(ValueError):
        validate_identifier("t; DROP TABLE x")


def test_reference_parity_api_round_trip(spark, tmp_path):
    """The VectorClient-shaped surface: ingestData → createEmbeddings →
    queryEmbeddings → getAnswer, end to end on a literal MDX doc."""
    eng = VectorEngine(
        spark, EngineConfig(chunk_size=120, chunk_overlap=30,
                            store_path=str(tmp_path)),
    )
    mdx = (
        "## Context\nspark engines process columnar data\n"
        "## Retrieval\nsimilarity search finds nearest neighbors fast\n"
        "## Storage\nparquet files hold the vector store rows"
    )
    eng.ingest_data(mdx, db_table="docs")
    emb = eng.create_embeddings("similarity search nearest neighbors")
    assert len(emb) == 64
    res = eng.query_embeddings(emb, db_table="docs", threshold=0.0, count=3)
    assert res["context"] and len(res["context"]) == len(res["metadata"])
    # the retrieval-relevant chunk should rank first
    assert "similarity" in res["context"][0]
    assert res["metadata"][0]["header"] == "## Retrieval"
    ans = eng.get_answer("how are neighbors found?", res)
    assert ans and ans.startswith("ANSWER: ")


def test_query_embeddings_missing_table_is_descriptive(spark, tmp_path):
    """Querying a never-ingested table must fail with a clear message,
    not an opaque parquet AnalysisException."""
    eng = VectorEngine(spark, EngineConfig(store_path=str(tmp_path)))
    with pytest.raises(ValueError, match="no data|ingest_data"):
        eng.query_embeddings([0.0] * 64, db_table="never_ingested")


def test_engine_dedup_embeddings_facade(spark, sf_smoke):
    """The facade must expose the threshold-adaptive router with the
    scale-safe default (LSH at 0.95)."""
    from vector_ai_npm_spark.io.sources import load_table

    eng = VectorEngine(spark, EngineConfig())
    emb = load_table(spark, sf_smoke, "embeddings")
    plan = eng.dedup_embeddings(emb)._jdf.queryExecution().analyzed().toString()
    assert "lsh_sig" in plan  # LSH route engaged by default


def test_reference_parity_rejects_invalid_doc(spark, tmp_path):
    eng = VectorEngine(spark, EngineConfig(store_path=str(tmp_path)))
    with pytest.raises(ValueError, match="## Context"):
        eng.ingest_data("## Intro\nno context here", db_table="docs")


def test_retry_with_backoff_semantics():
    from vector_ai_npm_spark.engine import retry_with_backoff

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("boom")
        return "ok"

    assert retry_with_backoff(flaky, max_retries=5, initial_delay_ms=1) == "ok"
    assert len(calls) == 3
    with pytest.raises(RuntimeError):
        retry_with_backoff(lambda: (_ for _ in ()).throw(RuntimeError("x")),
                           max_retries=2, initial_delay_ms=1)


def test_engine_pipeline_family_facade(spark, sf_smoke):
    """The training-pipeline facade methods (dedup_clusters / tfidf /
    sessionize) must agree with their registry-query counterparts."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark import registry
    from vector_ai_npm_spark.io.sources import load_table

    eng = VectorEngine(spark)
    docs = load_table(spark, sf_smoke, "documents")

    # dedup_clusters over the minhash pairs == dedup_components query
    pairs = registry.run("dedup_minhash_pairs", spark, sf_smoke)
    got = {
        (r.doc_id, r.component_id, r.is_canonical)
        for r in eng.dedup_clusters(docs, pairs).collect()
    }
    want = {
        (r.doc_id, r.component_id, r.is_canonical)
        for r in registry.run("dedup_components", spark, sf_smoke).collect()
    }
    assert got == want

    # tfidf top-5 == text_tfidf_scored (same scoring + tiebreak)
    got_t = {
        (r.doc_id, r.term, r.term_rank)
        for r in eng.tfidf(docs, top_k=5).collect()
    }
    want_t = {
        (r.doc_id, r.term, r.term_rank)
        for r in registry.run("text_tfidf_scored", spark, sf_smoke).collect()
    }
    assert got_t == want_t

    # sessionize session counts == registry sessionize
    ev = load_table(spark, sf_smoke, "events")
    got_s = (
        eng.sessionize(ev)
        .groupBy("user_id")
        .agg(F.max("session_seq").alias("m"))
        .collect()
    )
    want_s = {
        (r.user_id, r.m)
        for r in registry.run("sessionize", spark, sf_smoke)
        .groupBy("user_id")
        .agg(F.max("session_seq").alias("m"))
        .collect()
    }
    assert {(r.user_id, r.m) for r in got_s} == want_s


def test_engine_scale_family_facade(spark, sf_smoke, tmp_path):
    """cluster_store round-trips data unchanged; distinct_sketches
    produces mergeable state whose union estimate matches the exact
    distinct count at fixture cardinality."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.io.sources import load_table

    eng = VectorEngine(spark)
    ev = load_table(spark, sf_smoke, "events")

    path = str(tmp_path / "events_by_ts")
    eng.cluster_store(ev.select("event_id", "ts", "user_id"), path, ["ts"], buckets=4)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert {r.event_id for r in back.select("event_id").collect()} == {
        r.event_id for r in ev.select("event_id").collect()
    }

    daily = eng.distinct_sketches(
        ev.withColumn("day", F.to_date("ts")), ["event_type", "day"], "user_id"
    )
    est = (
        daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("user_id_hll")).alias("est"))
        .collect()
    )
    exact = {
        r.event_type: r.x
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("x"))
        .collect()
    }
    for r in est:
        assert abs(r.est - exact[r.event_type]) <= 0.02 * exact[r.event_type]


def test_engine_curation_facade(spark, sf_smoke):
    """split_dataset / decontaminate / keep_best_per_cluster facade
    methods: split is total and doc-keyed; decontamination flags the
    benchmark overlap; exactly one keeper per cluster."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.engine import VectorEngine
    from vector_ai_npm_spark.io.sources import load_table

    eng = VectorEngine(spark)
    docs = load_table(spark, sf_smoke, "documents")

    split = eng.split_dataset(docs)
    assert split.where(~F.col("split").isin("train", "val", "test")).count() == 0
    assert split.count() == docs.count()

    bench = docs.where(F.col("doc_id") % 97 == 0)
    flagged = eng.decontaminate(docs.where(F.col("doc_id") % 97 != 0), bench)
    assert "contaminated" in flagged.columns
    assert flagged.count() == docs.where(F.col("doc_id") % 97 != 0).count()

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2)], ["doc_id_a", "doc_id_b"]
    )
    scored = docs.select("doc_id", F.col("n_chars").alias("q"))
    kept = eng.keep_best_per_cluster(scored, pairs, "q")
    cluster = kept.where(F.col("component_id") == 0).collect()
    assert sum(1 for r in cluster if r.keep_best) == 1
    best = max(cluster, key=lambda r: (r.q, -r.doc_id))
    assert [r.doc_id for r in cluster if r.keep_best] == [best.doc_id]


def test_facade_retrieval_tier_methods(spark, sf_smoke):
    """The round-5 facade additions must delegate correctly:
    diverse search (MMR), PQ quantization, IVF-PQ search, and BPE
    tokenizer training all runnable from the VectorEngine surface."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.engine import EngineConfig, VectorEngine
    from vector_ai_npm_spark.io.sources import load_table

    eng = VectorEngine(spark, EngineConfig())
    emb = load_table(spark, sf_smoke, "embeddings")
    docs = load_table(spark, sf_smoke, "documents")

    queries = emb.where(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    diverse = eng.similarity_search_diverse(queries, emb, k=3, k_candidates=10)
    assert diverse.count() == 6  # 2 queries × 3 picks

    codes, books = eng.quantize_store(emb, m=8, ksub=16)
    assert codes.where(F.size("codes") != 8).count() == 0
    assert books.shape == (8, 16, 8)

    qvec = list(emb.where(F.col("vec_id") == 7).select("embedding").first()[0])
    hits = eng.search_quantized(emb, qvec, k=3, nlist=4, nprobe=2)
    rows = hits.orderBy("rank").collect()
    assert len(rows) == 3 and rows[0].vec_id == 7  # self-match at rank 1

    merges = eng.train_tokenizer(docs, n_merges=2)
    got = merges.collect()
    assert len(got) == 2 and all(m.merged == m.pair_left + m.pair_right for m in got)


def test_mmr_composes_with_ann_candidates(spark, sf_smoke):
    """mmr_rerank(candidates=...) must accept the ANN path's output —
    the two-stage diverse-retrieval composition (ANN prune → MMR)."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.retrieval.lsh import ann_similarity_join
    from vector_ai_npm_spark.retrieval.mmr import mmr_rerank

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.where(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    cand = ann_similarity_join(queries, emb, k=10)
    out = mmr_rerank(queries, emb, k=3, candidates=cand)
    per_q = {r[0]: r[1] for r in out.groupBy("q_vec_id").count().collect()}
    assert per_q == {0: 3, 7: 3}
    # picks must come from the ANN candidate set
    extra = out.join(
        cand.select("q_vec_id", "vec_id"), ["q_vec_id", "vec_id"], "left_anti"
    ).count()
    assert extra == 0


def test_engine_graph_and_tokenizer_facade(spark, sf_smoke, tmp_path):
    """The round-5 tiers are reachable through VectorEngine: graph ops
    on a caller-supplied edge list, tokenizer encode on trained merges,
    and the z-order store writer."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.engine import VectorEngine
    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.operators.graph_ops import copurchase_edges

    eng = VectorEngine(spark)
    edges = copurchase_edges(spark, sf_smoke).select("src", "dst")

    tri = eng.graph_triangles(edges)
    assert tri.columns == ["node", "n_triangles"]
    assert tri.count() >= 0

    pr = eng.graph_pagerank(edges, n_iter=2)
    total = pr.agg(F.sum("pagerank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-4

    docs = load_table(spark, sf_smoke, "documents").limit(50)
    merges = eng.train_tokenizer(docs, n_merges=3)
    dic = eng.encode_tokens(docs, merges)
    row = dic.where(F.size("toks") >= 1).limit(1).collect()[0]
    assert "".join(row.toks) == row.w

    path = str(tmp_path / "zorder")
    eng.zorder_store(
        load_table(spark, sf_smoke, "lineitem").select(
            "l_partkey", "l_suppkey"
        ),
        path, "l_partkey", "l_suppkey", buckets=4,
    )
    assert spark.read.parquet(path).count() > 0


def test_engine_diff_snapshots_facade(spark):
    """Generic snapshot diff: added / removed / changed classification
    with per-column old/new pairs and NULL-transition sensitivity."""
    from vector_ai_npm_spark.engine import VectorEngine

    eng = VectorEngine(spark)
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, s string, v double",
    )
    rows = {
        r.id: r
        for r in eng.diff_snapshots(old, new, "id", ["s", "v"]).collect()
    }
    assert set(rows) == {2, 3, 4}          # id 1 unchanged → dropped
    assert rows[2].diff_status == "changed" and rows[2].v_new == 25.0
    assert rows[3].diff_status == "changed"  # NULL → 30.0 surfaces
    assert rows[4].diff_status == "added" and rows[4].s_old is None


def test_delete_data_cascades_and_preserves_queries(spark, tmp_path):
    """GDPR delete: every chunk of the deleted doc disappears, other
    docs' chunks survive, and the store stays queryable (version-flip
    rewrite, never a half-deleted read)."""
    eng = VectorEngine(
        spark, EngineConfig(chunk_size=120, chunk_overlap=30,
                            store_path=str(tmp_path)),
    )
    docs = spark.createDataFrame(
        [
            (1, "## Context\nalpha doc\n## Body\nalpha content here"),
            (2, "## Context\nbeta doc\n## Body\nbeta content here"),
        ],
        ["doc_id", "mdx"],
    )
    eng.ingest_data(docs, db_table="docs")
    store_before = spark.read.parquet(f"{tmp_path}/docs")
    n_doc1 = store_before.where("doc_id = 1").count()
    assert n_doc1 > 0

    audit = eng.delete_data([1], db_table="docs")
    assert audit["rows_deleted"] == n_doc1
    assert audit["rows_before"] - audit["rows_deleted"] == audit["rows_after"]

    store_after = spark.read.parquet(f"{tmp_path}/docs")
    assert store_after.where("doc_id = 1").count() == 0
    assert store_after.where("doc_id = 2").count() > 0
    # still queryable through the reference-shaped API
    emb = eng.create_embeddings("beta content")
    res = eng.query_embeddings(emb, db_table="docs", count=2)
    assert res["context"]
    assert all("alpha" not in c for c in res["context"])


def test_delete_data_missing_table_is_descriptive(spark, tmp_path):
    eng = VectorEngine(spark, EngineConfig(store_path=str(tmp_path)))
    with pytest.raises(ValueError, match="no data"):
        eng.delete_data([1], db_table="ghost")


def test_delete_data_recovers_from_mid_swap_crash(spark, tmp_path):
    """A delete that died between the two renames leaves the store at
    __pre_delete; the next call must restore it and then succeed."""
    import os
    import shutil

    eng = VectorEngine(
        spark, EngineConfig(chunk_size=120, chunk_overlap=30,
                            store_path=str(tmp_path)),
    )
    docs = spark.createDataFrame(
        [
            (1, "## Context\nalpha doc\n## Body\nalpha content here"),
            (2, "## Context\nbeta doc\n## Body\nbeta content here"),
        ],
        ["doc_id", "mdx"],
    )
    eng.ingest_data(docs, db_table="docs")
    path = f"{tmp_path}/docs"
    # simulate the crash window: store renamed away, stale rewrite left
    os.rename(path, f"{path}__pre_delete")
    os.makedirs(f"{path}__rewrite")
    audit = eng.delete_data([1], db_table="docs")
    assert audit["rows_deleted"] > 0
    store = spark.read.parquet(path)
    assert store.where("doc_id = 1").count() == 0
    assert store.where("doc_id = 2").count() > 0
    assert not os.path.isdir(f"{path}__pre_delete")
    assert not os.path.isdir(f"{path}__rewrite")


def test_query_embeddings_recovers_from_mid_swap_crash(spark, tmp_path):
    """READER-side crash recovery (round-7 advice): a delete that died
    between the two renames parks the intact store at __pre_delete.
    query_embeddings must restore and serve it after the retry budget,
    not raise 'has no data' at a recoverable state."""
    import os

    eng = VectorEngine(
        spark, EngineConfig(chunk_size=120, chunk_overlap=30,
                            store_path=str(tmp_path)),
    )
    docs = spark.createDataFrame(
        [
            (1, "## Context\nalpha doc\n## Body\nalpha content here"),
            (2, "## Context\nbeta doc\n## Body\nbeta content here"),
        ],
        ["doc_id", "mdx"],
    )
    eng.ingest_data(docs, db_table="docs")
    path = f"{tmp_path}/docs"
    os.rename(path, f"{path}__pre_delete")
    os.makedirs(f"{path}__rewrite")
    emb = eng.create_embeddings("beta content")
    res = eng.query_embeddings(emb, db_table="docs", count=2)
    assert res["context"]  # served from the restored pre-delete store
    assert os.path.isdir(path)
    assert not os.path.isdir(f"{path}__pre_delete")
    # a plain missing table (no swap markers) still fails fast
    with pytest.raises(ValueError, match="no data"):
        eng.query_embeddings(emb, db_table="ghost")

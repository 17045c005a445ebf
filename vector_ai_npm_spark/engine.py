"""VectorEngine facade (SURVEY.md §2A A14).

Reference parity: ``new VectorClient(options)`` (vector-client.ts:61-113)
eagerly constructs an OpenAI client and a pg Pool from ``apiKey``/``dbUrl``
and stores chunking/model defaults (chunkSize=1000, chunkOverlap=200 at
:72-73; model gpt-4o, temperature 0 at :104-105). The Spark engine keeps
the same config surface but holds a SparkSession instead of network
clients; identifiers are validated instead of string-interpolated into SQL
(the reference's injection bug at :307/:403 is consciously not ported).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def validate_identifier(name: str) -> str:
    """Reject table/function names the reference would have interpolated raw."""
    if not _IDENT.match(name):
        raise ValueError(f"invalid identifier: {name!r}")
    return name


@dataclass
class EngineConfig:
    """Mirrors VectorClientOptions (vector-client.ts:9-17) minus secrets."""

    chunk_size: int = 1000        # vector-client.ts:72
    chunk_overlap: int = 200      # vector-client.ts:73
    embedding_dim: int = 64       # fixtures are 64-dim (1536 for ada-002 parity)
    model: str = "stub-llm"       # reference default gpt-4o (:104) — stubbed
    temperature: float = 0.0      # vector-client.ts:105
    template: str = "# Question: {question}\n# Context: {context}"
    store_path: str | None = None
    extra: dict = field(default_factory=dict)


def retry_with_backoff(func, max_retries: int = 5, initial_delay_ms: int = 500):
    """A12 parity: exponential-backoff retry (reference defaults 5×500 ms
    doubling, vector-client.ts:332-351; getAnswer overrides 2×1000 ms at
    :481). Inside Spark jobs, task retry (`spark.task.maxFailures`)
    subsumes this; it exists for driver-side boundary calls (a real
    embedding/LLM service) behind the stubbed stages."""
    import time

    delay = initial_delay_ms / 1000.0
    last: Exception | None = None
    for _ in range(max_retries):
        try:
            return func()
        except Exception as e:  # noqa: BLE001 — boundary-call wrapper
            last = e
            time.sleep(delay)
            delay *= 2
    raise last if last else RuntimeError("retry_with_backoff: no attempts")


class VectorEngine:
    """Session + config holder; the operator modules do the real work.

    Spark-native usage::

        eng = VectorEngine(spark, EngineConfig(chunk_size=120))
        chunks = eng.ingest(mdx_df)          # A13 pipeline
        hits = eng.similarity_search(store_df, qvec, threshold=0.2, k=5)

    Reference-parity usage (the VectorClient method surface, so a
    reference user maps 1:1 — ingestData/createEmbeddings/
    queryEmbeddings/getAnswer, vector-client.ts:141/375/396/424)::

        eng.ingest_data(mdx_string, db_table="docs")
        emb = eng.create_embeddings("what is X?")
        res = eng.query_embeddings(embeddings=emb, threshold=0.2, count=5)
        ans = eng.get_answer("what is X?", res)
    """

    def __init__(self, spark: SparkSession, config: EngineConfig | None = None):
        from vector_ai_npm_spark.session import apply_runtime_confs

        self.spark = apply_runtime_confs(spark)
        self.config = config or EngineConfig()

    # --- Spark-native entry points (thin wrappers; see each module) -----

    def ingest(self, docs: DataFrame, text_col: str = "mdx") -> DataFrame:
        from vector_ai_npm_spark.rag.pipeline import ingest_pipeline

        return ingest_pipeline(docs, self.config, text_col=text_col)

    def similarity_search(self, store: DataFrame, query_vec: list[float],
                          threshold: float = 0.0, k: int = 10) -> DataFrame:
        from vector_ai_npm_spark.retrieval.search import similarity_search_topk

        return similarity_search_topk(store, query_vec, threshold, k)

    def similarity_search_diverse(self, queries: DataFrame, store: DataFrame,
                                  k: int = 5, k_candidates: int = 20,
                                  lam: float = 0.7) -> DataFrame:
        """MMR diversity re-rank: exact/ANN candidates per query, then
        greedy relevance-vs-redundancy selection (retrieval.mmr) — the
        distributed generalization of getAnswer's context dedup
        (vector-client.ts:434-444)."""
        from vector_ai_npm_spark.retrieval.mmr import mmr_rerank

        return mmr_rerank(queries, store, k=k, k_candidates=k_candidates,
                          lam=lam)

    def quantize_store(self, store: DataFrame, m: int = 8,
                       ksub: int = 16):
        """Train PQ codebooks and encode the store to m-byte codes
        (32× compression at dim=64); returns (codes_df, codebooks) —
        pass both to `search_quantized`."""
        from vector_ai_npm_spark.retrieval.pq import pq_encode, train_pq

        books = train_pq(store, m=m, ksub=ksub)
        return pq_encode(store, books), books

    def search_quantized(self, store: DataFrame, query_vec: list[float],
                         k: int = 5, nlist: int = 8,
                         nprobe: int = 4) -> DataFrame:
        """IVF-PQ batch search: cell pruning → ADC code shortlist →
        exact re-rank (retrieval.pq.ivfpq_search)."""
        from vector_ai_npm_spark.retrieval.pq import ivfpq_search

        return ivfpq_search(store, query_vec, k=k, nlist=nlist, nprobe=nprobe)

    def train_tokenizer(self, docs: DataFrame, text_col: str = "text",
                        n_merges: int = 8) -> DataFrame:
        """Learn BPE merge pairs from the corpus (text.bpe — one
        corpus-scale pass, then vocab-scale merge rounds)."""
        from vector_ai_npm_spark.text.bpe import train_bpe_merges

        return train_bpe_merges(docs, text_col=text_col, n_merges=n_merges)

    def encode_tokens(self, docs: DataFrame, merges: DataFrame,
                      text_col: str = "text") -> DataFrame:
        """Apply trained BPE merges: returns the encoded distinct-word
        dictionary (w, toks) — join token counts back to exploded words
        for per-document streams; corpus text never enters Python."""
        from vector_ai_npm_spark.text.bpe import bpe_encode_dictionary

        return bpe_encode_dictionary(docs, merges, text_col=text_col)

    def zorder_store(self, df: DataFrame, path: str, key_a: str, key_b: str,
                     buckets: int = 16) -> None:
        """Persist ``df`` z-order-clustered on two keys so 2-D box
        queries skip files via parquet min-max footers on EITHER
        dimension (see operators.scale_suite.cluster_by_zorder)."""
        from vector_ai_npm_spark.operators.scale_suite import cluster_by_zorder

        cluster_by_zorder(df, path, key_a, key_b, buckets=buckets)

    def graph_triangles(self, edges: DataFrame) -> DataFrame:
        """Per-node triangle counts on a canonical (src < dst) edge
        list — degree-oriented wedge enumeration (hub-proof)."""
        from vector_ai_npm_spark.operators.graph_ops import triangle_counts

        return triangle_counts(edges)

    def graph_pagerank(self, edges: DataFrame, n_iter: int = 3) -> DataFrame:
        """Fixed-iteration power-method PageRank on a canonical edge
        list, treated undirected; exact-decimal neighbor folds."""
        from vector_ai_npm_spark.operators.graph_ops import pagerank_edges

        return pagerank_edges(edges, n_iter=n_iter)

    def diff_snapshots(self, old: DataFrame, new: DataFrame, key: str,
                       compare_cols: list[str]) -> DataFrame:
        """Change feed between two snapshots of a keyed table: one
        full-outer join + null-safe residual; unchanged rows never fan
        out (see operators.pipeline_ops.diff_snapshots)."""
        from vector_ai_npm_spark.operators.pipeline_ops import diff_snapshots

        return diff_snapshots(old, new, key, compare_cols)

    def dedup_clusters(self, docs: DataFrame, pairs: DataFrame,
                       doc_id: str = "doc_id") -> DataFrame:
        """Close a near-dup candidate-pair relation (from any of the
        dedup_* generators) into transitive clusters: every doc gets a
        component_id and an is_canonical keep-flag."""
        from vector_ai_npm_spark.dedup.components import assign_components

        return assign_components(docs, pairs, doc_id=doc_id)

    def tfidf(self, docs: DataFrame, doc_id: str = "doc_id",
              text_col: str = "text", top_k: int | None = None) -> DataFrame:
        """Document-term TF-IDF scores (smoothed idf); top_k keeps the
        k best terms per doc (deterministic term tiebreak)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        tok = docs.select(
            F.col(doc_id).alias("doc_id"),
            F.explode(F.split(F.lower(text_col), "[^a-z]+")).alias("term"),
        ).where(F.col("term") != "")
        tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
        df = F.count(F.lit(1)).over(Window.partitionBy("term")).cast("long")
        n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
        scored = (
            tf.withColumn("df", df)
            .crossJoin(F.broadcast(n))
            .withColumn(
                "score",
                F.col("tf")
                * (F.log((1 + F.col("n_docs")) / (1 + F.col("df"))) + F.lit(1.0)),
            )
        )
        if top_k is None:
            return scored
        w = Window.partitionBy("doc_id").orderBy(
            F.col("score").desc(), F.col("term").asc()
        )
        return (
            scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
            .where(F.col("term_rank") <= top_k)
        )

    def sessionize(self, events: DataFrame, user_col: str = "user_id",
                   ts_col: str = "ts", gap: str = "30 minutes") -> DataFrame:
        """Gaps-and-islands session keys: a new session starts after a
        silence longer than `gap` (one shuffle on the user key)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
        is_start = F.when(
            F.lag(ts_col).over(w).isNull()
            | (F.col(ts_col) > F.lag(ts_col).over(w) + F.expr(f"INTERVAL {gap}")),
            1,
        ).otherwise(0)
        wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return events.withColumn(
            "session_seq", F.sum(is_start).over(wrun).cast("long")
        )

    def cluster_store(self, df: DataFrame, path: str, keys: list[str],
                      buckets: int = 16) -> None:
        """Persist ``df`` range-clustered on ``keys`` so range scans skip
        files via parquet min-max footers (see operators.scale_suite)."""
        from vector_ai_npm_spark.operators.scale_suite import cluster_by_range

        cluster_by_range(df, path, keys, buckets=buckets)

    def dedup_embeddings(self, df: DataFrame, threshold: float = 0.95,
                         mode: str = "auto", **kwargs) -> DataFrame:
        """Embedding near-dup pairs via the threshold-adaptive router:
        LSH prune + exact re-rank at production thresholds (≥0.7), exact
        salted grid join below — the scale-safe default is always on
        (see dedup.embedding_router)."""
        from vector_ai_npm_spark.dedup.embedding_router import (
            embedding_dedup_pairs,
        )

        return embedding_dedup_pairs(df, threshold, mode=mode, **kwargs)

    def distinct_sketches(self, df: DataFrame, group_cols: list[str],
                          value_col: str, lg_k: int = 14) -> DataFrame:
        """Per-group HLL sketch column — persistable, mergeable distinct
        state (union partials later with F.hll_union_agg)."""
        from pyspark.sql import functions as F

        return df.groupBy(*group_cols).agg(
            F.hll_sketch_agg(value_col, lg_k).alias(f"{value_col}_hll")
        )

    def split_dataset(self, df: DataFrame, id_col: str = "doc_id",
                      train: int = 96, val: int = 2) -> DataFrame:
        """Deterministic leakage-safe train/val/test split column keyed on
        the DOCUMENT id (derived rows inherit the split by joining on the
        id — no document straddles train and eval). Percentages are
        train/val with the remainder as test."""
        from pyspark.sql import functions as F

        key = F.md5(F.concat_ws("#", F.col(id_col).cast("string"),
                                F.lit("split")))
        bucket = F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint") % 100
        return df.withColumn(
            "split",
            F.when(bucket < train, "train")
            .when(bucket < train + val, "val")
            .otherwise("test"),
        )

    def decontaminate(self, corpus: DataFrame, benchmark: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      ngram: int = 8) -> DataFrame:
        """Flag corpus rows sharing any `ngram`-token shingle with the
        benchmark set (broadcast semi join on the gram key — the corpus
        is never shuffled by gram). Returns corpus plus a
        ``contaminated`` boolean; drop or quarantine flagged rows before
        training."""
        from pyspark.sql import functions as F

        toks = (
            f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"
        )
        grams_expr = (
            f"CASE WHEN size({toks}) >= {ngram} THEN array_distinct("
            f"transform(sequence(1, size({toks}) - {ngram - 1}), "
            f"i -> array_join(slice({toks}, i, {ngram}), ' '))) "
            f"ELSE array(array_join({toks}, ' ')) END"
        )
        bench_grams = (
            benchmark.select(F.explode(F.expr(grams_expr)).alias("gram"))
            .distinct()
        )
        hits = (
            corpus.select(id_col, F.explode(F.expr(grams_expr)).alias("gram"))
            .join(F.broadcast(bench_grams), "gram", "left_semi")
            .select(id_col)
            .distinct()
            .withColumn("_hit", F.lit(True))
        )
        return (
            corpus.join(hits, id_col, "left")
            .withColumn("contaminated", F.coalesce("_hit", F.lit(False)))
            .drop("_hit")
        )

    def keep_best_per_cluster(self, docs: DataFrame, pairs: DataFrame,
                              quality_col: str,
                              id_col: str = "doc_id") -> DataFrame:
        """Close near-dup pairs into components and keep the
        HIGHEST-quality member per cluster (min-id tiebreak) — the
        curation semantics where the best copy survives, not the
        first-crawled one."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from vector_ai_npm_spark.dedup.components import assign_components

        comp = assign_components(docs, pairs, doc_id=id_col).select(
            id_col, "component_id"
        )
        w = Window.partitionBy("component_id").orderBy(
            F.col(quality_col).desc(), F.col(id_col).asc()
        )
        return (
            docs.join(comp, id_col)
            .withColumn("keep_best", F.row_number().over(w) == 1)
        )

    # --- reference-parity surface (VectorClient method names) -----------

    def _store_path(self, db_table: str) -> str:
        import tempfile

        validate_identifier(db_table)
        base = self.config.store_path or tempfile.mkdtemp(prefix="vector_store_")
        self.config.store_path = base
        return f"{base}/{db_table}"

    def ingest_data(self, data: str | DataFrame, db_table: str) -> None:
        """`ingestData({data, dbTable})` (vector-client.ts:141-152):
        chunk → validate (strict: raises on a non-'## Context' doc, :165)
        → subsplit → embed → append to the named store table."""
        from vector_ai_npm_spark.chunking.mdx import split_mdx_headers, validate_context
        from vector_ai_npm_spark.rag.pipeline import ingest_pipeline

        docs = (
            self.spark.createDataFrame([(0, data)], ["doc_id", "mdx"])
            if isinstance(data, str)
            else data
        )
        from vector_ai_npm_spark.io.lease import writer_lease

        validate_context(split_mdx_headers(docs), strict=True)
        out = ingest_pipeline(docs, self.config)
        # doc_id is stored alongside the reference's (content, embedding,
        # metadata) triple so delete_data can cascade by source document —
        # additive: readers of the reference shape never touch it.
        # The writer lease serializes this append against delete_data's
        # snapshot-rewrite-swap: an append landing inside that window
        # would be silently swept by the swap (r10 verdict item 8), so
        # writers converge (serialized) or raise — never interleave.
        with writer_lease(self._store_path(db_table), op="ingest_data"):
            (out.select(
                "doc_id", "content", "embedding", F_to_json_metadata(out)
            ).write.mode("append").parquet(self._store_path(db_table)))

    def delete_data(self, doc_ids: list[int], db_table: str) -> dict:
        """Right-to-be-forgotten: remove every store row derived from the
        given source documents (all chunks/sub-chunks/embeddings cascade,
        since each store row carries its doc_id).

        No reference counterpart — the reference client can only INSERT
        (vector-client.ts has no delete path); this closes the GDPR gap
        its store would accumulate.  The rewrite is a broadcast anti-join
        (request set is dim-sized) published by rename swap.  The swap is
        two renames, NOT atomic: a reader racing the instant between them
        sees a missing table (and retries), never a half-deleted one —
        and a crash between them is recovered on the next call (the
        intact pre-delete directory is restored before anything else
        runs).  Production deployments point readers at a version
        manifest instead (io/compaction.py's version-flip publish).
        Returns the audit counts the `delete_cascade` registry query
        formalizes (zero-orphan contract); rows that predate the
        doc_id-carrying store schema cannot be attributed to a document
        and make the delete REFUSE rather than silently survive.

        Writers (this method and ingest_data's append) serialize on a
        table-level lease (io/lease.py, r10 verdict item 8): concurrent
        writers converge in some order or raise StoreWriterConflict —
        an append can no longer land inside the snapshot→swap window
        and be silently swept.  Readers stay lock-free (retry contract
        above).
        """
        import os
        import shutil

        from vector_ai_npm_spark.io.lease import writer_lease

        path = self._store_path(db_table)
        old = f"{path}__pre_delete"
        tmp = f"{path}__rewrite"
        # the writer lease covers the WHOLE snapshot → rewrite → swap
        # sequence: a concurrent ingest_data append (or second delete)
        # blocks at the lease instead of landing inside the window and
        # being silently swept by the swap (r10 verdict item 8)
        with writer_lease(path, op="delete_data"):
            # crash recovery: a prior delete that died mid-swap left the
            # intact store at __pre_delete — restore it, then discard any
            # stale half-written rewrite
            if not os.path.isdir(path) and os.path.isdir(old):
                os.rename(old, path)
            for stale in (tmp, old):
                if os.path.isdir(stale):
                    shutil.rmtree(stale)
            if not os.path.isdir(path):
                raise ValueError(
                    f"vector store table {db_table!r} has no data"
                )
            return self._delete_data_locked(doc_ids, db_table, path, old, tmp)

    def _delete_data_locked(
        self, doc_ids: list[int], db_table: str, path: str, old: str, tmp: str
    ) -> dict:
        """Body of delete_data, running under the table writer lease."""
        import os
        import shutil

        from pyspark.sql import functions as F
        # mergeSchema: an append-era store may mix pre-doc_id files with
        # new ones; a single-footer read could silently drop the column
        store = (
            self.spark.read.option("mergeSchema", "true").parquet(path)
        )
        if "doc_id" not in store.columns:
            raise ValueError(
                f"store table {db_table!r} predates the doc_id schema — "
                "re-ingest (or backfill doc_id) before deleting by document"
            )
        unattributed = store.where(F.col("doc_id").isNull()).count()
        if unattributed:
            raise ValueError(
                f"{unattributed} rows in {db_table!r} have no doc_id "
                "(pre-schema files); a delete would silently skip them — "
                "backfill doc_id first"
            )
        ids = self.spark.createDataFrame(
            [(int(i),) for i in doc_ids], "doc_id long"
        )
        survivors = store.join(F.broadcast(ids), "doc_id", "left_anti")
        before = store.count()
        survivors.write.mode("overwrite").parquet(tmp)
        after = self.spark.read.parquet(tmp).count()
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        return {
            "rows_before": before,
            "rows_deleted": before - after,
            "rows_after": after,
        }

    def create_embeddings(self, question: str) -> list[float]:
        """`createEmbeddings(question)` (vector-client.ts:375-388) with
        the deterministic local embedder behind the same signature."""
        from vector_ai_npm_spark.embedding.hashing import embed_text_py

        return embed_text_py(question, self.config.embedding_dim)

    def query_embeddings(self, embeddings: list[float],
                         db_table: str | None = None,
                         threshold: float = 0.0, count: int = 10) -> dict:
        """`queryEmbeddings({embeddings, dbFunction, threshold, count})`
        (vector-client.ts:396-415): top-k rows shaped into the
        reference's parallel arrays {context: [...], metadata: [...]}
        (:411-412).

        A missing store path is re-probed briefly before raising:
        ``delete_data``'s publish is two renames (path → __pre_delete,
        __rewrite → path), so a reader can land in the microsecond gap
        between them and see no directory.  The retry loop (5 × 50 ms,
        far wider than the gap) makes the docstring's "readers retry"
        contract real instead of pushing it onto the caller."""
        import os
        import time

        from pyspark.sql import functions as F

        from vector_ai_npm_spark.retrieval.search import similarity_search_topk

        import json

        table = db_table or "default"
        path = self._store_path(table)
        # retry ONLY when a delete swap is visibly in flight (the
        # __pre_delete/__rewrite markers exist) — a plain missing table
        # (typo, never ingested) must fail fast, not eat the 250 ms
        # retry budget meant for the microsecond rename gap
        for _ in range(5):
            if os.path.isdir(path):
                break
            if not (
                os.path.isdir(f"{path}__pre_delete")
                or os.path.isdir(f"{path}__rewrite")
            ):
                break
            time.sleep(0.05)
        # Retry budget exhausted with the swap markers still present:
        # 250 ms is orders of magnitude wider than the rename gap, so
        # this is a CRASHED delete (store parked at __pre_delete, new
        # version never published), not an in-flight one.  Perform the
        # same crash-recovery restore delete_data's preamble does, so
        # the reader serves the intact pre-delete store instead of
        # raising "has no data" at a fully recoverable state
        # (round-7 advice).  The stale __rewrite is left for the next
        # delete_data call to discard — removing it here isn't needed
        # for correctness and keeps the reader path rename-only.
        if not os.path.isdir(path) and os.path.isdir(f"{path}__pre_delete"):
            # two concurrent readers can both pass the isdir checks;
            # the rename is the atomic arbiter — the loser's OSError
            # (or a delete that resumed mid-swap) is fine as long as
            # SOMEONE published a directory at `path`, so swallow and
            # re-check below instead of raising a spurious error over
            # intact data (round-8 advice)
            try:
                os.rename(f"{path}__pre_delete", path)
            except OSError:
                pass
        if not os.path.isdir(path):
            raise ValueError(
                f"vector store table {table!r} has no data at {path} — "
                "call ingest_data(..., db_table=...) before querying it"
            )
        store = self.spark.read.parquet(path)
        hits = similarity_search_topk(
            store.withColumn("vec_id", F.monotonically_increasing_id()),
            embeddings, threshold, count,
        ).collect()
        return {
            "context": [r["content"].strip() for r in hits],
            "metadata": [json.loads(r["metadata"]) for r in hits],
        }

    def get_answer(self, question: str, embedding_result: dict) -> str | None:
        """`getAnswer(question, embedding)` (vector-client.ts:424-489):
        context-group dedup + prompt assembly + (stubbed) model call."""
        from vector_ai_npm_spark.rag.pipeline import (
            context_group_dedup,
            llm_answer_stub,
            prompt_assemble,
        )
        from pyspark.sql import functions as F

        rows = [
            (m["context"] if isinstance(m, dict) else getattr(m, "context", c), c, i + 1)
            for i, (c, m) in enumerate(
                zip(embedding_result["context"], embedding_result["metadata"])
            )
        ]
        if not rows:
            return None
        retrieved = self.spark.createDataFrame(rows, ["context", "content", "rank"])
        groups = context_group_dedup(retrieved)
        prompt = prompt_assemble(groups, question)
        out = prompt.select(llm_answer_stub()(F.col("prompt")).alias("a")).first()
        return out["a"] if out else None


def F_to_json_metadata(df: DataFrame):
    from pyspark.sql import functions as F

    return F.col("metadata_json").alias("metadata")

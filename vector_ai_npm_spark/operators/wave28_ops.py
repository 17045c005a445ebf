"""Wave 28: incremental IVF append, near-dup incidence by source pair.

* `vector_store_ivf_append` — incremental index maintenance (the
  missing half of the at-rest IVF story: real stores grow batch by
  batch, and a full rebuild per batch prices a sample-sized problem
  at corpus scale): build the cell-partitioned store from the base
  two-thirds of the corpus, APPEND the remaining third through the
  frozen centroids (retrieval.store.append_ivf_store — cell
  boundaries never move, new files land in existing cell dirs), then
  pin the contract: store row count = base + appended EXACTLY, an
  APPENDED vector's self-search surfaces at rank 1 with sim ≈ 1, and
  its top-k overlap vs the exact ranking clears the same ≥3/5 floor
  as `ivf_store_recall`.
* `dedup_source_pair_rate` — near-dup incidence per source pair: the
  DOC-LEVEL mirror-detection evidence next to `text_vocab_overlap`'s
  word-level one (two sources can share vocabulary without sharing
  documents; shared near-dup PAIRS are the stronger signal a crawler
  is fetching the same site twice).  Reuses the hash-green banded-LSH
  candidate pairs verbatim (both faces — the Spark callable and the
  oracle CTE — so this face can never drift from the dedup family),
  joins sources onto both sides, canonicalizes the pair, and emits
  exact counts plus the pair rate over the possible cross-pair count.

Scale shape: the append path is one Arrow-batched assignment over the
new batch only (base store untouched); the pair-rate matrix rides the
output-bound candidate frame with two broadcast-size source joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


@query(
    "vector_store_ivf_append",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE vec_id % 3 <> 0) AS BIGINT)
             AS n_base,
           CAST(COUNT(*) FILTER (WHERE vec_id % 3 = 0) AS BIGINT)
             AS n_appended,
           CAST(COUNT(*) AS BIGINT) AS n_store,
           CAST(8 AS BIGINT) AS n_cells,
           TRUE AS self_rank1_ok,
           TRUE AS recall_ok
    FROM embeddings
    """,
)
def vector_store_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append contract — see module docstring.  The query vector is an
    APPENDED row (vec_id = 42, 42 % 3 = 0), so rank-1 self-match
    proves appended files are visible to the pruned search path."""
    import tempfile

    from vector_ai_npm_spark.functions.vectors import cosine_similarity
    from vector_ai_npm_spark.retrieval.store import (
        append_ivf_store,
        persist_ivf_store,
        search_ivf_store,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 3 != 0)
    batch = emb.where(F.col("vec_id") % 3 == 0)
    store_dir = tempfile.mkdtemp(prefix="ivf_append_")
    persist_ivf_store(base, store_dir, nlist=8)
    append_ivf_store(batch, store_dir)
    stored = spark.read.parquet(f"{store_dir}/cells")
    qvec = list(
        emb.where(F.col("vec_id") == 42).select("embedding").first()[0]
    )
    # corpus-scaled probe budget (r11 sf1 catch — see store.scaled_nprobe)
    from vector_ai_npm_spark.retrieval.store import scaled_nprobe

    hits = search_ivf_store(
        spark, store_dir, qvec, k=5,
        nprobe=scaled_nprobe(emb.count(), nlist=8),
    )
    # exact top-5 over the FULL corpus (base + appended)
    q = F.lit(qvec).cast("array<float>")
    exact = (
        emb.select(
            "vec_id", cosine_similarity(F.col("embedding"), q).alias("sim")
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(5)
        .select(F.col("vec_id").alias("e_vec_id"))
    )
    overlap = hits.join(
        exact, hits.vec_id == F.col("e_vec_id")
    ).agg(F.count(F.lit(1)).alias("n_overlap"))
    self_ok = hits.where(
        (F.col("rank") == 1)
        & (F.col("vec_id") == 42)
        & (F.col("similarity") >= 0.999999)
    ).agg(F.count(F.lit(1)).alias("n_self"))
    counts = (
        base.agg(F.count(F.lit(1)).cast("bigint").alias("n_base"))
        .crossJoin(
            F.broadcast(
                batch.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_appended")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                stored.agg(F.count(F.lit(1)).cast("bigint").alias("n_store"))
            )
        )
        .crossJoin(
            F.broadcast(
                spark.read.parquet(f"{store_dir}/centroids").agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_cells")
                )
            )
        )
    )
    return (
        counts.crossJoin(F.broadcast(self_ok))
        .crossJoin(F.broadcast(overlap))
        .select(
            "n_base", "n_appended", "n_store", "n_cells",
            (F.col("n_self") == 1).alias("self_rank1_ok"),
            (F.col("n_overlap") >= 3).alias("recall_ok"),
        )
    )


def _pairs_oracle_cte() -> str:
    # read the raw dict, NOT all_oracles(): the latter triggers the
    # load-everything cascade mid-import of THIS module (the
    # dedup_components circularity lesson, dedup/queries.py:508)
    import vector_ai_npm_spark.dedup.queries  # noqa: F401  (registers)
    from vector_ai_npm_spark import registry

    return registry._ORACLES["dedup_minhash_pairs"]


@query(
    "dedup_source_pair_rate",
    oracle=f"""
    WITH cand AS ({_pairs_oracle_cte()}),
    pairs AS (SELECT DISTINCT doc_id_a, doc_id_b FROM cand),
    tagged AS (
      SELECT LEAST(da.source, db.source) AS source_a,
             GREATEST(da.source, db.source) AS source_b
      FROM pairs p
      JOIN documents da ON da.doc_id = p.doc_id_a
      JOIN documents db ON db.doc_id = p.doc_id_b
    ),
    m AS (
      SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM tagged GROUP BY 1, 2
    ),
    ns AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    )
    SELECT m.source_a, m.source_b, m.n_pairs,
           na.n_docs AS docs_a, nb.n_docs AS docs_b,
           CAST(CASE WHEN m.source_a = m.source_b
                     THEN (na.n_docs * (na.n_docs - 1)) // 2
                     ELSE na.n_docs * nb.n_docs END AS BIGINT)
             AS pairs_possible,
           CAST(m.n_pairs AS DOUBLE)
             / CAST(CASE WHEN m.source_a = m.source_b
                         THEN (na.n_docs * (na.n_docs - 1)) // 2
                         ELSE na.n_docs * nb.n_docs END AS DOUBLE)
             AS pair_rate
    FROM m
    JOIN ns na ON na.source = m.source_a
    JOIN ns nb ON nb.source = m.source_b
    """,
)
def dedup_source_pair_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup incidence per source pair — see module docstring.
    Candidate pairs come from the registered dedup_minhash_pairs
    callable verbatim; sources attach by two broadcast joins on the
    output-bound pair frame; the matrix is ≤|sources|² rows."""
    from vector_ai_npm_spark import registry

    pairs = (
        registry._QUERIES["dedup_minhash_pairs"](spark, sf_dir)
        .select("doc_id_a", "doc_id_b")
        .distinct()
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    da = docs.select(
        F.col("doc_id").alias("doc_id_a"), F.col("source").alias("sa")
    )
    db = docs.select(
        F.col("doc_id").alias("doc_id_b"), F.col("source").alias("sb")
    )
    tagged = (
        pairs.join(F.broadcast(da), "doc_id_a")
        .join(F.broadcast(db), "doc_id_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    m = tagged.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    ns = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    na = ns.select(
        F.col("source").alias("source_a"), F.col("n_docs").alias("docs_a")
    )
    nb = ns.select(
        F.col("source").alias("source_b"), F.col("n_docs").alias("docs_b")
    )
    possible = F.when(
        F.col("source_a") == F.col("source_b"),
        F.expr("docs_a * (docs_a - 1) div 2"),
    ).otherwise(F.col("docs_a") * F.col("docs_b")).cast("bigint")
    return (
        m.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a", "source_b", "n_pairs", "docs_a", "docs_b",
            possible.alias("pairs_possible"),
            (F.col("n_pairs").cast("double") / possible.cast("double")).alias(
                "pair_rate"
            ),
        )
    )

"""Wave 56: IVF-RQ — cell pruning composed over residual-quantized
codes, completing the additive branch of the two-stage index family
(IVF-PQ has had the subspace branch since round 7; wave 51 added the
flat RQ codes; this wires them together the way FAISS's
IndexIVFResidualQuantizer does).

Pipeline per search: rank cells by centroid distance (driver-side,
nlist-sized), scan ONLY the probed cells' 4-byte codes, stage-LUT ADC
shortlist with the PROBED-SCALED budget (max(4k, probed/5) — the
round-8 fixed-budget lesson, third family member to inherit it), then
exact cosine re-rank of the shortlist.  Memory story: the scanned
index row is cell_id + 4 code bytes + one norm float — the 100 TB
candidate set fits where raw float vectors cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.retrieval.scaling import recall_floors

_QUERY_IDS = (0, 7, 42)


def scaled_rq_stages(n: int, base: int = 4) -> int:
    """Corpus-scaled RQ code length: +2 stages (bytes) per corpus
    decade beyond the 2k tuning scale, base unchanged at ≤2k so
    sf0.01/0.1 hashes hold (the r11 scaled_hash_tables/scaled_nprobe
    discipline applied to code CAPACITY).

    Why stages and not probes: the r11 sf1 sweep showed the FULL-probe
    recall floor failing — pruning exonerated, pure ADC-shortlist loss.
    As the corpus grows, the sim gap between true top-k and the bulk
    narrows, so a fixed 4-byte code's ordering noise swamps it; code
    bits must grow ~log(n) to keep ADC ordering power.  Measured at sf1
    (tools/ivfrq_scale_study.py, TUNING.md r12): 4 stages → half 11/15
    (q42=2 < 3), full 13/15 (q42=3 < 4), both RED; 6 stages → half
    13/15 (min 4), full 14/15 (min 4), all floors GREEN."""
    from vector_ai_npm_spark.retrieval.scaling import corpus_decades

    return base + 2 * corpus_decades(n)


def _search_all(spark, sf_dir, nprobe):
    from vector_ai_npm_spark.retrieval.rq import (
        build_ivfrq_index,
        ivfrq_search_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    idx, cents, books, counts = build_ivfrq_index(
        emb, nlist=8, nstages=scaled_rq_stages(emb.count()), ksub=16
    )
    idx = idx.localCheckpoint(eager=True)
    frames = []
    for qid in _QUERY_IDS:
        qvec = list(
            emb.where(F.col("vec_id") == qid).select("embedding").first()[0]
        )
        frames.append(
            ivfrq_search_index(
                idx, cents, books, emb, qvec, k=5, nprobe=nprobe,
                cell_counts=counts,
            ).withColumn("q_vec_id", F.lit(qid).cast("long"))
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return emb, out


@query("similarity_search_ivfrq")  # rows-only: cells/codes model-defined
def similarity_search_ivfrq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-RQ search rows face (nprobe=4 of nlist=8) — see module
    docstring; the recall contract is `ivfrq_recall_contract`."""
    _, out = _search_all(spark, sf_dir, nprobe=4)
    return out.select("q_vec_id", "vec_id", "similarity", "rank")


@query(
    "ivfrq_recall_contract",
    oracle="""
    SELECT method, scope, ok FROM (VALUES
      ('ivfrq_self_top1', 'all', TRUE),
      ('ivfrq_half', 'q0', TRUE), ('ivfrq_half', 'q7', TRUE),
      ('ivfrq_half', 'q42', TRUE), ('ivfrq_half', 'all', TRUE),
      ('ivfrq_full', 'q0', TRUE), ('ivfrq_full', 'q7', TRUE),
      ('ivfrq_full', 'q42', TRUE), ('ivfrq_full', 'all', TRUE)
    ) t(method, scope, ok)
    """,
)
def ivfrq_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-RQ's contract vs the hash-green exact top-k:

      * self rank-1 — each probe surfaces its own row first (its cell
        is always probed; shared quantization error keeps self-score
        maximal through the ADC shortlist and the exact re-rank);
      * nprobe=4 (half the cells): ≥3/5 per query, ≥0.65 aggregate —
        the family floor separating pruned search from chance
        (measured 12/15 at sf0.01, 10/15 at sf0.1 on the
        uniform-random quantization-hostile fixture);
      * nprobe=8 (every cell): ≥4/5 per query, ≥0.8 aggregate —
        isolates pure ADC-shortlist loss from cell pruning (measured
        13/15 at BOTH sfs; the residual 2 misses are vectors whose
        4-byte reconstruction ranks below the probed/5 shortlist cut,
        the documented price of 64× compression)."""
    from vector_ai_npm_spark.retrieval.queries import _recall_rows
    from vector_ai_npm_spark.retrieval.search import similarity_join

    emb, half = _search_all(spark, sf_dir, nprobe=4)
    _, full = _search_all(spark, sf_dir, nprobe=8)
    queries = emb.where(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    exact = similarity_join(queries, emb, k=5, threshold=0.0)
    self_ok = (
        half.where(F.col("rank") == 1)
        .agg(F.bool_and(F.col("vec_id") == F.col("q_vec_id")).alias("ok"))
        .select(
            F.lit("ivfrq_self_top1").alias("method"),
            F.lit("all").alias("scope"),
            F.coalesce("ok", F.lit(False)).alias("recall_ok"),
        )
    )
    out = (
        self_ok
        .unionByName(
            _recall_rows("ivfrq_half", half, exact,
                         *recall_floors("ivfrq_half"))
        )
        .unionByName(
            _recall_rows("ivfrq_full", full, exact,
                         *recall_floors("ivfrq_full"))
        )
    )
    return out.withColumnRenamed("recall_ok", "ok")

"""Wave 50: filtered ANN (predicate pushdown into the IVF probe) and
the EXIF orientation audit.

* `similarity_search_ivf_filtered` + `ivf_filtered_recall_contract` —
  top-k vector search under a metadata predicate, the production
  vector-store shape (FAISS IDSelector, pgvector `WHERE`, every
  filtered-RAG query).  See retrieval.ivf.ivf_similarity_join_filtered
  for the two scale decisions (pre-filter inside probed cells;
  selectivity-widened nprobe).
* `multimodal_exif_orientation` — per-orientation asset counts and the
  transpose volume for a JPEG corpus, parsed from REAL APP1 bytes via
  the TIFF IFD walker (multimodal/exif.py) — the rotate-before-train
  audit that runs before any pixel decode capacity is provisioned.

Reference scope: §2B north-star breadth — the reference client
(vector-client.ts) delegates vector search to pgvector, whose filtered
`WHERE` queries are exactly the shape `similarity_search_ivf_filtered`
re-expresses Spark-side; it has no image path at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.retrieval.scaling import recall_floors

_QUERY_IDS = (0, 7, 42)
def _pred():
    """The contract predicate (~30% selectivity on the fixture).
    Built lazily: Column construction needs an active SparkContext,
    and registry import must work without one."""
    return F.col("label") % 3 == 1


def _queries_frame(emb: DataFrame) -> DataFrame:
    return emb.where(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )


@query("similarity_search_ivf_filtered")  # rows-only: cell model-defined
def similarity_search_ivf_filtered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Filtered ANN rows face: top-5 neighbors among label%3==1 vectors
    only, nlist=16 / nprobe=4 widened by measured selectivity (~0.3 →
    14 probed cells).  Its full contract vs the exact filtered top-k is
    driver-checked by `ivf_filtered_recall_contract`."""
    from vector_ai_npm_spark.retrieval.ivf import ivf_similarity_join_filtered

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_similarity_join_filtered(
        _queries_frame(emb), emb, _pred(), k=5, nlist=16, nprobe=4
    ).select("q_vec_id", "vec_id", "similarity", "rank")


@query(
    "ivf_filtered_recall_contract",
    oracle="""
    SELECT method, scope, ok FROM (VALUES
      ('filtered_validity', 'all', TRUE),
      ('filtered_fill', 'all', TRUE),
      ('filtered_full', 'q0', TRUE), ('filtered_full', 'q7', TRUE),
      ('filtered_full', 'q42', TRUE), ('filtered_full', 'all', TRUE),
      ('filtered_widened', 'q0', TRUE), ('filtered_widened', 'q7', TRUE),
      ('filtered_widened', 'q42', TRUE), ('filtered_widened', 'all', TRUE)
    ) t(method, scope, ok)
    """,
)
def ivf_filtered_recall_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Filtered ANN's contract vs the hash-green exact machinery, as
    oracle-pinnable booleans:

      * validity — every returned neighbor satisfies the predicate
        (the gate that catches dropping the filter entirely);
      * fill — every query returns exactly k rows whenever the
        filtered corpus holds ≥ k candidates (the gate that catches
        post-filtering, which under-fills k at selectivity < 1);
      * full-probe identity — at nprobe = nlist the filtered probe
        must EQUAL the exact brute-force top-k over the filtered
        store, 5/5 per query (quantizer + filter compose losslessly);
      * widened half-family floor — nprobe=4 selectivity-widened to
        ~14/16 cells: ≥3/5 per query, ≥0.75 aggregate (measured 14/15
        at sf0.01 AND sf0.1 on the uniform-random ANN-hostile fixture;
        UNWIDENED nprobe=4 would scan ~4·sel cells' worth of passing
        vectors and was measured as low as 8/15 at nprobe=2-equiv)."""
    from vector_ai_npm_spark.retrieval.ivf import ivf_similarity_join_filtered
    from vector_ai_npm_spark.retrieval.queries import _recall_rows
    from vector_ai_npm_spark.retrieval.search import similarity_join

    emb = load_table(spark, sf_dir, "embeddings")
    queries = _queries_frame(emb)
    exact = similarity_join(queries, emb.where(_pred()), k=5, threshold=0.0)
    widened = ivf_similarity_join_filtered(
        queries, emb, _pred(), k=5, nlist=16, nprobe=4
    )
    full = ivf_similarity_join_filtered(
        queries, emb, _pred(), k=5, nlist=16, nprobe=16
    )
    validity = (
        widened.join(emb.select("vec_id", "label"), "vec_id")
        .agg(F.bool_and(_pred()).alias("ok"))
        .select(
            F.lit("filtered_validity").alias("method"),
            F.lit("all").alias("scope"),
            F.coalesce("ok", F.lit(False)).alias("recall_ok"),
        )
    )
    fill = (
        widened.groupBy("q_vec_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            (
                (F.count(F.lit(1)) == len(_QUERY_IDS))
                & F.bool_and(F.col("n") == 5)
            ).alias("ok")
        )
        .select(
            F.lit("filtered_fill").alias("method"),
            F.lit("all").alias("scope"),
            F.col("ok").alias("recall_ok"),
        )
    )
    out = (
        validity.unionByName(fill)
        .unionByName(
            _recall_rows("filtered_full", full, exact,
                         *recall_floors("filtered_full"))
        )
        .unionByName(
            _recall_rows("filtered_widened", widened, exact,
                         *recall_floors("filtered_widened"))
        )
    )
    return out.withColumnRenamed("recall_ok", "ok")


@query(
    "multimodal_exif_orientation",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             1 + CAST(doc_id % 8 AS INTEGER) AS orientation,
             16 + CAST(doc_id % 31 AS INTEGER) AS w,
             16 + CAST((doc_id * 3) % 29 AS INTEGER) AS h
      FROM documents
    )
    SELECT CAST(orientation AS BIGINT) AS orientation,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           orientation >= 5 AS needs_transpose,
           CAST(SUM(CASE WHEN orientation >= 5 THEN h ELSE w END)
                AS BIGINT) AS sum_display_width,
           CAST(SUM(CASE WHEN orientation >= 5 THEN w ELSE h END)
                AS BIGINT) AS sum_display_height,
           TRUE AS all_parsed
    FROM m
    GROUP BY 1, 3
    """,
)
def multimodal_exif_orientation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXIF orientation audit — see module docstring.  Per doc a REAL
    JPEG skeleton (SOI + JFIF APP0 the walker must skip + APP1 Exif
    TIFF blob, endianness alternating by doc_id) is built and parsed
    back in the executors; the oracle reconstructs orientation/dims
    from the synthesis formula, so a marker-walk, IFD, endianness, or
    transpose defect flips a count or a display-dim sum → hash red."""
    from vector_ai_npm_spark.multimodal.exif import (
        display_dims,
        encode_jpeg_with_exif,
        exif_orientation,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def _audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                orient = 1 + did % 8
                w = 16 + did % 31
                h = 16 + (did * 3) % 29
                jpeg = encode_jpeg_with_exif(
                    w, h, orient, little=did % 2 == 0
                )
                po, pw, ph, endian = exif_orientation(jpeg)
                dw, dh = display_dims(pw, ph, po)
                ok = (po, pw, ph) == (orient, w, h) and endian == (
                    "little" if did % 2 == 0 else "big"
                )
                rows.append((po, po >= 5, dw, dh, ok))
            yield pd.DataFrame(
                rows,
                columns=[
                    "orientation", "needs_transpose",
                    "display_w", "display_h", "ok",
                ],
            )

    # Deliberately NOT spread to executor parallelism (r14 measured
    # counter-case): the exif skeleton synth+parse is ~0.3 s of Python
    # for the whole sf0.1 corpus, and the RoundRobin exchange moved the
    # isolated face 0.49 s -> 0.53-0.64 s (1.05 -> up to 1.36x its
    # pin).  The r13 spread pattern stays right where per-row codec
    # cost dominates (decode faces, pdf audit); here the per-task
    # Arrow/scheduling overhead exceeds the freed compute.
    parsed = docs.mapInPandas(
        _audit,
        schema="orientation long, needs_transpose boolean, "
        "display_w long, display_h long, ok boolean",
    )
    return parsed.groupBy("orientation", "needs_transpose").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum("display_w").cast("bigint").alias("sum_display_width"),
        F.sum("display_h").cast("bigint").alias("sum_display_height"),
        F.bool_and("ok").alias("all_parsed"),
    ).select(
        "orientation", "n_assets", "needs_transpose",
        "sum_display_width", "sum_display_height", "all_parsed",
    )

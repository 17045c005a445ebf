"""Heaps'-law vocabulary growth curve (wave 18).

`text_heaps_law` — V(k): distinct vocabulary size after the first k
documents, at the 10%..100% deciles of the corpus.  The empirical
curve a corpus planner fits V = K·n^β against (Heaps 1978): sublinear
growth (β ≈ 0.5) is healthy natural text; β → 1 signals unbounded
noise vocab (OCR junk, ids), β → 0 template spam — the corpus-level
companion to the per-doc `text_distinct_ngrams` diversity screen, and
the number that sizes tokenizer vocabularies and embedding tables
before a 100 TB train run.

Exactness: everything is integer counting — no fits, no floats except
one division for the tokens-per-new-type readout.

Scale shape (the type-level-state discipline): tokenize ONCE; a
token-keyed aggregate reduces the corpus to the VOCABULARY frame
carrying each type's first-appearance doc rank (min over an in-row
doc index) and per-doc token counts reduce to the |docs|-row frame;
the decile lattice then folds both tiny frames with broadcast
cutoffs.  Doc rank is doc_id rank (dense corpus ids), so the "first
k docs" prefix is deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.text.queries import _DUCK_TOKS, _SPARK_TOKS

_DECILES = tuple(range(1, 11))


@query(
    "text_heaps_law",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents
    ),
    first_seen AS (
      SELECT term, CAST(MIN(doc_id) AS BIGINT) AS first_doc
      FROM tok GROUP BY term
    ),
    doc_tokens AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks
      FROM tok GROUP BY doc_id
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rk
      FROM documents
    ),
    cuts AS (
      SELECT CAST(d.decile AS BIGINT) AS decile, r.doc_id AS cutoff
      FROM (VALUES {", ".join(f"({d})" for d in _DECILES)}) AS d(decile)
      CROSS JOIN nd
      JOIN ranked r ON r.rk = GREATEST(1, (nd.n_docs * d.decile) // 10)
    ),
    fs AS (
      SELECT c.decile, c.cutoff,
             CAST(COUNT(*) AS BIGINT) AS vocab
      FROM cuts c JOIN first_seen f ON f.first_doc <= c.cutoff
      GROUP BY 1, 2
    ),
    dt AS (
      SELECT c.decile,
             CAST(COUNT(*) AS BIGINT) AS n_docs_prefix,
             CAST(SUM(t.n_toks) AS BIGINT) AS n_tokens
      FROM cuts c JOIN doc_tokens t ON t.doc_id <= c.cutoff
      GROUP BY 1
    )
    SELECT fs.decile, fs.cutoff AS cutoff_doc,
           dt.n_docs_prefix, dt.n_tokens, fs.vocab,
           CAST(dt.n_tokens AS DOUBLE) / CAST(fs.vocab AS DOUBLE)
             AS tokens_per_type
    FROM fs JOIN dt USING (decile)
    """,
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V(k) at corpus deciles — see module docstring.  Cutoffs are the
    decile doc_ids by rank (= the id at rank ⌈k·n/10⌉ over the dense
    fixture ids), computed from the |docs|-row frame."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr(_SPARK_TOKS)).alias("term")
    )
    first_seen = tok.groupBy("term").agg(
        F.min("doc_id").cast("bigint").alias("first_doc")
    )
    doc_tokens = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_toks")
    )
    n_docs = docs.count()
    # decile cutoff = doc_id at rank max(1, n*decile/10), over the
    # |docs|-row id frame (unpartitioned window on the reduced frame)
    w = Window.orderBy("doc_id")
    ranked = docs.select("doc_id").withColumn(
        "rk", F.row_number().over(w)
    )
    cut_rows = ranked.where(
        F.col("rk").isin(
            *[max(1, (n_docs * d) // 10) for d in _DECILES]
        )
    )
    cuts = None
    for d in _DECILES:
        rk = max(1, (n_docs * d) // 10)
        leg = cut_rows.where(F.col("rk") == rk).select(
            F.lit(d).cast("bigint").alias("decile"),
            F.col("doc_id").alias("cutoff"),
        )
        cuts = leg if cuts is None else cuts.unionAll(leg)
    fs = first_seen.crossJoin(F.broadcast(cuts)).where(
        F.col("first_doc") <= F.col("cutoff")
    ).groupBy("decile", "cutoff").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab")
    )
    dt = doc_tokens.crossJoin(F.broadcast(cuts)).where(
        F.col("doc_id") <= F.col("cutoff")
    ).groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_prefix"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
    )
    return fs.join(dt, "decile").select(
        "decile",
        F.col("cutoff").alias("cutoff_doc"),
        "n_docs_prefix",
        "n_tokens",
        "vocab",
        (
            F.col("n_tokens").cast("double")
            / F.col("vocab").cast("double")
        ).alias("tokens_per_type"),
    )

"""ROUGE-2 verification scoring for dedup candidate pairs (wave 10).

Banded-LSH candidate generation (dedup_minhash_pairs) trades precision
for recall by design — the production near-dup pipeline always follows
it with a VERIFICATION stage that scores each candidate pair exactly.
`dedup_ngram_jaccard` verifies with set-Jaccard; `eval_rouge2_candidates`
adds the multiset view every summarization/overlap eval uses
(ROUGE-2, Lin 2004):

    overlap(a, b) = Σ_g min(mₐ(g), m_b(g))        (g: bigram TYPE,
                                                   m: instance count)
    recall    = overlap / |bigrams(b)|
    precision = overlap / |bigrams(a)|
    f1        = 2·P·R / (P + R)

Multiset counts matter where sets saturate: a doc that repeats one
boilerplate bigram 50× shares ONE set element with its near-dup but 50
multiset instances — containment-style scores built on sets cannot
distinguish "shares the phrase" from "is mostly that phrase".

Scale design (100 TB): the pair frame is the LSH candidate output —
output-bound, never n².  The per-doc bigram-TYPE count frame (the same
pre-aggregation discipline as lm_bigram_score: per-position bigrams
collapse to type counts BEFORE any join) is computed once and joined
twice — (doc_a, g) then (doc_b, g) — so the fan-out per pair is the
doc's bigram-type count, and the min/sum verification aggregate is
pair-keyed.  Integer arithmetic end-to-end; the three ratios are final
single divisions of int64s (cross-engine exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.dedup.queries import (
    _BAND_KEYS_DUCK,
    _duck_minhash,
    _DUCK_SHINGLES,
    N_MINHASH,
    dedup_minhash_pairs,
)
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.text.queries import _DUCK_TOKS, _SPARK_TOKS

_O_PAIRS = (
    "sh AS (SELECT doc_id, "
    + _DUCK_SHINGLES
    + " AS shingles FROM documents), sig AS (SELECT doc_id, "
    + ", ".join(f"{_duck_minhash(i)} AS mh{i}" for i in range(N_MINHASH))
    + " FROM sh), bands AS (SELECT doc_id, unnest(["
    + ", ".join(_BAND_KEYS_DUCK)
    + """]) AS band_key FROM sig),
    pairs AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      FROM bands a JOIN bands b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id)"""
)


@query(
    "eval_rouge2_candidates",
    oracle=f"""
    WITH {_O_PAIRS},
    t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    bg AS (SELECT doc_id, toks[r.i] AS w1, toks[r.i + 1] AS w2
           FROM t CROSS JOIN UNNEST(range(1, len(toks))) AS r(i)),
    dbt AS MATERIALIZED (
      SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS m
      FROM bg GROUP BY ALL),
    nb AS MATERIALIZED (
      SELECT doc_id, CAST(SUM(m) AS BIGINT) AS nb
      FROM dbt GROUP BY doc_id),
    ov AS (
      SELECT p.doc_id_a, p.doc_id_b,
             CAST(SUM(LEAST(a.m, b.m)) AS BIGINT) AS overlap
      FROM pairs p
      JOIN dbt a ON a.doc_id = p.doc_id_a
      JOIN dbt b ON b.doc_id = p.doc_id_b
                AND a.w1 = b.w1 AND a.w2 = b.w2
      GROUP BY p.doc_id_a, p.doc_id_b)
    SELECT p.doc_id_a, p.doc_id_b,
           COALESCE(ov.overlap, 0) AS overlap,
           CAST(COALESCE(ov.overlap, 0) AS DOUBLE)
             / CAST(NULLIF(na.nb, 0) AS DOUBLE) AS precision_,
           CAST(COALESCE(ov.overlap, 0) AS DOUBLE)
             / CAST(NULLIF(nbb.nb, 0) AS DOUBLE) AS recall,
           CASE WHEN COALESCE(ov.overlap, 0) > 0 THEN
             2.0 * (CAST(ov.overlap AS DOUBLE) / CAST(na.nb AS DOUBLE))
                 * (CAST(ov.overlap AS DOUBLE) / CAST(nbb.nb AS DOUBLE))
               / ((CAST(ov.overlap AS DOUBLE) / CAST(na.nb AS DOUBLE))
                  + (CAST(ov.overlap AS DOUBLE) / CAST(nbb.nb AS DOUBLE)))
           ELSE 0.0 END AS f1
    FROM pairs p
    LEFT JOIN ov ON ov.doc_id_a = p.doc_id_a AND ov.doc_id_b = p.doc_id_b
    LEFT JOIN nb na ON na.doc_id = p.doc_id_a
    LEFT JOIN nb nbb ON nbb.doc_id = p.doc_id_b
    """,
)
def eval_rouge2_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 P/R/F1 for every banded-LSH candidate pair — the exact
    verification stage after candidate generation; see module docstring.
    """
    docs = load_table(spark, sf_dir, "documents")
    # the candidate frame is output-bound (LSH) and feeds the overlap
    # join + the final assembly — checkpoint once, as a production
    # pipeline persists its candidate set between stages
    pairs = dedup_minhash_pairs(spark, sf_dir).localCheckpoint(eager=True)
    t = docs.select("doc_id", F.expr(_SPARK_TOKS).alias("toks"))
    bg = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)), "
                "slice(toks, 2, greatest(size(toks) - 1, 0)), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("bgm"),
    ).select("doc_id", "bgm.w1", "bgm.w2")
    # dbt feeds three consumers (a-side, b-side, per-doc totals); the
    # per-doc bigram-type frame is the verifier's working set — one
    # checkpoint replaces three corpus tokenizes (measured: 8 Generates
    # pre-checkpoint).  Linear in corpus; production persists it.
    dbt = (
        bg.groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=True)
    )
    nb = dbt.groupBy("doc_id").agg(F.sum("m").alias("nb"))
    a = dbt.select(
        F.col("doc_id").alias("doc_id_a"), "w1", "w2",
        F.col("m").alias("ma"),
    )
    b = dbt.select(
        F.col("doc_id").alias("doc_id_b"), "w1", "w2",
        F.col("m").alias("mb"),
    )
    ov = (
        pairs.join(a, "doc_id_a")
        .join(b, ["doc_id_b", "w1", "w2"])
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.sum(F.least("ma", "mb")).alias("overlap"))
    )
    na = nb.select(F.col("doc_id").alias("doc_id_a"), F.col("nb").alias("na"))
    nbb = nb.select(
        F.col("doc_id").alias("doc_id_b"), F.col("nb").alias("nbb")
    )
    ovl = F.coalesce("overlap", F.lit(0).cast("long"))
    prec = ovl.cast("double") / F.nullif(F.col("na"), F.lit(0)).cast("double")
    rec = ovl.cast("double") / F.nullif(F.col("nbb"), F.lit(0)).cast("double")
    return (
        pairs.join(ov, ["doc_id_a", "doc_id_b"], "left")
        .join(na, "doc_id_a", "left")
        .join(nbb, "doc_id_b", "left")
        .select(
            "doc_id_a",
            "doc_id_b",
            ovl.alias("overlap"),
            prec.alias("precision_"),
            rec.alias("recall"),
            F.when(ovl > 0, F.lit(2.0) * prec * rec / (prec + rec))
            .otherwise(F.lit(0.0))
            .alias("f1"),
        )
    )

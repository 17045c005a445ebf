"""Kneser-Ney smoothed bigram LM scoring (wave 10).

`lm_bigram_score` (text/queries.py:672) is the add-one-smoothed
fluency gate; interpolated Kneser-Ney (Kneser & Ney 1995; Chen &
Goodman 1999 found it the strongest n-gram smoother) is what a real
LM-quality filter uses — add-one drowns the signal on large
vocabularies, while KN's absolute discounting plus CONTINUATION
probability (how many distinct contexts a word follows, not how often
it occurs) is the difference between "the word is frequent" and "the
word combines freely":

    P_KN(w₂|w₁) = max(c(w₁w₂) − d, 0) / c(w₁·)
                  + d · N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··)

with discount d = 0.75 (the Chen-Goodman default), N₁₊(w₁·) = distinct
successors of w₁, N₁₊(·w₂) = distinct predecessors of w₂, N₁₊(··) =
distinct bigram types.  `lm_kneser_ney` scores each document by its
mean per-instance P_KN — the same mean-probability face as
lm_bigram_score (no ln(), which diverges cross-engine by ulps).

Float discipline: d = 0.75 is exactly representable; every c/N term is
an int64; each P_KN is a fixed dag of IEEE ops on exact inputs —
bit-identical cross-engine — and the per-doc mean folds through the
exact-decimal dsum.

Scale design (100 TB): identical budget to lm_bigram_score — per-doc
bigram TYPE counts aggregate before any join (the per-position frame
never shuffles); the model tables c(w₁·)+N₁₊(w₁·) and N₁₊(·w₂) are
vocabulary-keyed aggregates over the bigram-type frame (sublinear in
corpus) joining back on their own keys (shuffle reuse, as
lm_bigram_score's c1 join); N₁₊(··) attaches as a broadcast scalar;
one final doc-keyed mean.  Nothing corpus-sized shuffles twice, and
the model tables are exactly what a production run would persist for
reuse across scoring jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.numeric import dsum, o_dsum
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.text.queries import _DUCK_TOKS, _SPARK_TOKS

_D = 0.75   # absolute discount (exactly representable in binary)


@query(
    "lm_kneser_ney",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    bg AS (SELECT doc_id, toks[r.i] AS w1, toks[r.i + 1] AS w2
           FROM t CROSS JOIN UNNEST(range(1, len(toks))) AS r(i)),
    dbt AS (SELECT doc_id, w1, w2, COUNT(*) AS m FROM bg GROUP BY ALL),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg GROUP BY ALL),
    pre AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                   CAST(COUNT(*) AS BIGINT) AS n1p_fwd
            FROM c12 GROUP BY w1),
    cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_bwd
             FROM c12 GROUP BY w2),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM c12),
    sc AS (SELECT dbt.doc_id, dbt.m,
                  (CAST(c12.c12 AS DOUBLE) - {_D!r}) / CAST(pre.c1 AS DOUBLE)
                  + {_D!r} * CAST(pre.n1p_fwd AS DOUBLE)
                           / CAST(pre.c1 AS DOUBLE)
                           * CAST(cont.n1p_bwd AS DOUBLE)
                           / CAST(tot.n_types AS DOUBLE) AS p
           FROM dbt JOIN c12 USING (w1, w2) JOIN pre USING (w1)
                    JOIN cont USING (w2) CROSS JOIN tot),
    pd AS (SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_bigrams,
                  {o_dsum('CAST(m AS DOUBLE) * p')}
                    / CAST(SUM(m) AS DOUBLE) AS avg_kn_p
           FROM sc GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(pd.n_bigrams, 0) AS n_bigrams,
           pd.avg_kn_p
    FROM documents d LEFT JOIN pd USING (doc_id)
    """,
)
def lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram fluency score per document — see
    module docstring for the formula and the shuffle budget.

    Every scored bigram has c(w₁w₂) ≥ 1 > d, so the max(·,0) clamp is
    statically satisfied and omitted from both engines' expressions.
    """
    docs = load_table(spark, sf_dir, "documents")
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
    dbt = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("m"))
    # c12 feeds FOUR consumers (pre, cont, tot, the score join); without
    # truncation each re-derives the corpus tokenize (measured: 5
    # Generates / 6 scans in the plan).  The bigram-TYPE table is
    # vocabulary-sized — exactly the model table a production run
    # persists — so checkpointing it costs ~nothing and cuts the corpus
    # passes to the two irreducible ones (dbt + c12).
    c12 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=True)
    )
    pre = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).alias("n1p_fwd"),
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    tot = c12.agg(F.count(F.lit(1)).alias("n_types"))
    p = (
        (F.col("c12").cast("double") - F.lit(_D)) / F.col("c1").cast("double")
        + F.lit(_D)
        * F.col("n1p_fwd").cast("double")
        / F.col("c1").cast("double")
        * F.col("n1p_bwd").cast("double")
        / F.col("n_types").cast("double")
    )
    sc = (
        dbt.join(c12, ["w1", "w2"])
        .join(pre, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "m", p.alias("p"))
    )
    pd = sc.groupBy("doc_id").agg(
        F.sum("m").alias("n_bigrams"),
        (
            dsum(F.col("m").cast("double") * F.col("p"))
            / F.sum("m").cast("double")
        ).alias("avg_kn_p"),
    )
    return docs.select("doc_id").join(pd, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        "avg_kn_p",
    )

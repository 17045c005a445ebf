"""Collocation mining (wave 3): corpus-level PMI-ranked bigram phrases.

The word2phrase / Mikolov-2013 phrase-detection step every tokenizer
pipeline runs before vocabulary training: find word pairs that co-occur
far more than independence predicts, so "new york" becomes one token.
Reference scope note: the reference has no corpus-statistics surface
(vector-client.ts embeds raw chunk text); this extends the text-analysis
family (text/queries.py B19).

Cross-engine determinism: PMI proper needs log(p12/(p1·p2)) and ln is
engine-divergent by ulps, so the score is the log-free MONOTONE
equivalent ``lift_ppm = c12·N·10^6 div (c1·c2)`` in exact int64
arithmetic — same ranking, identical bits in both engines (the
lm_bigram_score / drift_token_chisq decision).  int64 headroom: the
product is bounded by max_c12 · N · 10^6 ≈ 2^47 at sf0.1; a corpus
beyond ~10^9 bigrams must route the multiply through DECIMAL(38,0) —
documented here, asserted nowhere hot.

Scale design (100 TB): bigrams reduce to (w1,w2) TYPE counts before
anything joins — the per-position frame never shuffles.  Two
vocabulary-sized count shuffles (pair + unigram), the unigram frame
joined back twice by key (vocabulary-sized build sides), corpus total
as a broadcast 1-row frame, and a distributed TakeOrdered top-20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.text.queries import _DUCK_TOKS, _SPARK_TOKS

_MIN_SUPPORT = 5   # pairs below this are noise (word2phrase min-count)
_TOP_K = 20


@query(
    "text_pmi_cooccur",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    bg AS (SELECT toks[r.i] AS w1, toks[r.i + 1] AS w2
           FROM t CROSS JOIN UNNEST(range(1, len(toks))) AS r(i)),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg GROUP BY ALL),
    uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
              SELECT w1 AS w FROM bg
              UNION ALL
              SELECT w2 AS w FROM bg
            ) GROUP BY w),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM bg)
    SELECT w1, w2, c12,
           u1.c AS c1, u2.c AS c2,
           (c12 * tot.n * 1000000) // (u1.c * u2.c) AS lift_ppm
    FROM c12
    JOIN uni u1 ON c12.w1 = u1.w
    JOIN uni u2 ON c12.w2 = u2.w
    CROSS JOIN tot
    WHERE c12 >= {_MIN_SUPPORT}
    ORDER BY lift_ppm DESC, w1, w2
    LIMIT {_TOP_K}
    """,
)
def text_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19+: top-{k} collocations by integer-exact PMI lift.

    Unigram counts use BIGRAM-SLOT occurrences (each position counted
    once per slot it fills) so c1·c2 and c12·N share a denominator —
    the standard word2phrase formulation.  Deterministic total order
    via the (lift DESC, w1, w2) tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(F.expr(_SPARK_TOKS).alias("toks"))
    bg = t.select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)), "
                "(x, i) -> struct(x AS w1, toks[i + 1] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = (
        bg.select(F.col("w1").alias("w"))
        .unionAll(bg.select(F.col("w2").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = bg.agg(F.count(F.lit(1)).alias("n"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        c12.where(F.col("c12") >= _MIN_SUPPORT)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", "c12", "c1", "c2",
            F.expr("c12 * n * 1000000 div (c1 * c2)").alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "w1", "w2")
        .limit(_TOP_K)
    )


@query(
    "text_distinct_ngrams",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents),
    uni AS (SELECT lang, unnest(toks) AS g FROM t),
    bi AS (SELECT lang, toks[r.i] || ' ' || toks[r.i + 1] AS g
           FROM t CROSS JOIN UNNEST(range(1, len(toks))) AS r(i)),
    stats AS (
      SELECT lang, 1 AS n,
             CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_n,
             CAST(COUNT(*) AS BIGINT) AS total_n
      FROM uni GROUP BY lang
      UNION ALL
      SELECT lang, 2,
             CAST(COUNT(DISTINCT g) AS BIGINT),
             CAST(COUNT(*) AS BIGINT)
      FROM bi GROUP BY lang
    )
    SELECT lang, n, distinct_n, total_n,
           CAST(distinct_n AS DOUBLE) / CAST(total_n AS DOUBLE)
             AS distinct_ratio
    FROM stats
    """,
)
def text_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity report: distinct-1 / distinct-2 ratios per
    language (Li et al. 2016's generation-diversity metric, applied as
    the mode-collapse / template-spam screen on training corpora — a
    low distinct-2 means the corpus repeats the same phrasings).

    N-grams reduce to per-(lang, n) DISTINCT + total counts; the
    distinct is one vocabulary-sized exact aggregate per n (no sketch
    needed — the STATE is distinct grams, sublinear in corpus), and the
    ratio is a per-row scalar divide of identical integers."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", F.expr(_SPARK_TOKS).alias("toks"))
    uni = t.select("lang", F.explode("toks").alias("g"))
    bi = t.select(
        "lang",
        F.explode(
            F.expr(
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)), "
                "(x, i) -> concat(x, ' ', toks[i + 1]))"
            )
        ).alias("g"),
    )

    def stats(df: DataFrame, n: int) -> DataFrame:
        return df.groupBy("lang").agg(
            F.countDistinct("g").alias("distinct_n"),
            F.count(F.lit(1)).alias("total_n"),
        ).select("lang", F.lit(n).alias("n"), "distinct_n", "total_n")

    out = stats(uni, 1).unionByName(stats(bi, 2))
    return out.select(
        "lang", "n", "distinct_n", "total_n",
        (
            F.col("distinct_n").cast("double")
            / F.col("total_n").cast("double")
        ).alias("distinct_ratio"),
    )

"""BM25 ranking (wave 3): the standard lexical retrieval scorer
(Robertson-Sparck Jones probabilistic model, k1=1.2 b=0.75 — the
Lucene/Elasticsearch defaults), completing the retrieval family's
lexical leg next to the vector rankers (retrieval/queries.py) and
TF-IDF (text/queries.py).  Reference scope note: the reference ranks by
pgvector cosine only (vector-client.ts:240 `ORDER BY embedding <=>`);
BM25 is the hybrid-search counterpart its users pair with it (the
retrieval_fusion_rrf fuse takes exactly such a ranking).

Cross-engine split (the text_tfidf decision): BM25's term saturation
``tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` is RATIONAL — with k1=6/5,
b=3/4 and avgdl=total_len/n_docs, multiplying through by 10·total_len
gives exact int64 numerator/denominator — so the hash-checked contract
(`text_bm25`) carries the saturated tf exactly, plus the Robertson idf
as the exact rational pair (2(N−df)+1, 2df+1) whose ln both engines
would disagree on by ulps.  The summed ln-weighted score lives in the
rows-only face `text_bm25_topk` with a pure-Python re-derivation test
(tests/test_wave8.py).  int64 headroom: tf_sat_den ≤ 10·total·tf +
3·total + 9·dl·N ≈ 2^52 at 10^9-token corpora; beyond ~10^13 tokens the
products route through DECIMAL(38,0) — documented here, same note as
text_pmi_cooccur.

Scale design (100 TB): tokenize+explode ONCE; one (doc,term) shuffle
builds tf; df and dl are windows over the doc-term matrix (term-keyed
and doc-keyed — reaggregating tok would duplicate the tokenize subtree
in the plan, the text_tfidf lesson); the query batch is a broadcast
literal; n_docs/total_len come from a Generate-free count-only scan and
attach as a broadcast 1-row frame.  Nothing wider than the doc-term
matrix ever shuffles, and the matched frame after the query-term join
is |terms-in-batch|-sparse.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.text.queries import _DUCK_TOKS, _SPARK_TOKS

# the fixed query batch (fixture-vocab terms; production swaps the
# literal frame for a driver-supplied one, same broadcast shape)
QUERY_TERMS: tuple[tuple[int, str], ...] = (
    (1, "join"), (1, "merge"),
    (2, "window"), (2, "sort"), (2, "hash"),
    (3, "scan"), (3, "filter"),
)
_TOP_K = 3

_DUCK_QT = "(VALUES " + ", ".join(
    f"({q}, '{t}')" for q, t in QUERY_TERMS
) + ") AS qt(query_id, term)"


def _matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-term matrix with df/dl attached and the query batch joined —
    the shared frame behind both faces."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.expr(_SPARK_TOKS)).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    mat = tf.select(
        "doc_id",
        "term",
        "tf",
        F.count(F.lit(1))
        .over(Window.partitionBy("term"))
        .cast("long")
        .alias("df"),
        F.sum("tf")
        .over(Window.partitionBy("doc_id"))
        .cast("long")
        .alias("dl"),
    )
    qt = spark.createDataFrame(
        list(QUERY_TERMS), "query_id: bigint, term: string"
    )
    tot = docs.select(F.expr(f"size({_SPARK_TOKS})").alias("n")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("total_len"),
    )
    return mat.join(F.broadcast(qt), "term").crossJoin(F.broadcast(tot))


@query(
    "text_bm25",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, term
    ),
    mat AS (
      SELECT doc_id, term, tf,
             CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df,
             CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl
      FROM tf
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len({_DUCK_TOKS})) AS BIGINT) AS total_len
      FROM documents
    )
    SELECT CAST(qt.query_id AS BIGINT) AS query_id,
           m.doc_id, m.term, m.tf, m.df, m.dl,
           22 * m.tf * t.total_len AS tf_sat_num,
           10 * t.total_len * m.tf + 3 * t.total_len + 9 * m.dl * t.n_docs
             AS tf_sat_den,
           CAST(22 * m.tf * t.total_len AS DOUBLE)
             / CAST(10 * t.total_len * m.tf + 3 * t.total_len
                    + 9 * m.dl * t.n_docs AS DOUBLE) AS tf_sat,
           2 * (t.n_docs - m.df) + 1 AS idf_num,
           2 * m.df + 1 AS idf_den
    FROM mat m JOIN {_DUCK_QT} USING (term) CROSS JOIN tot t
    """,
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 exact-integer contract face — see module docstring.  One
    row per (query, matching doc, term) with the saturated tf as an
    exact rational and the Robertson idf as an exact rational pair."""
    m = _matrix(spark, sf_dir)
    num = F.lit(22) * F.col("tf") * F.col("total_len")
    den = (
        F.lit(10) * F.col("total_len") * F.col("tf")
        + F.lit(3) * F.col("total_len")
        + F.lit(9) * F.col("dl") * F.col("n_docs")
    )
    return m.select(
        "query_id",
        "doc_id",
        "term",
        "tf",
        "df",
        "dl",
        num.cast("long").alias("tf_sat_num"),
        den.cast("long").alias("tf_sat_den"),
        (num.cast("double") / den.cast("double")).alias("tf_sat"),
        (F.lit(2) * (F.col("n_docs") - F.col("df")) + 1)
        .cast("long")
        .alias("idf_num"),
        (F.lit(2) * F.col("df") + 1).cast("long").alias("idf_den"),
    )


@query("text_bm25_topk")  # rows-only: summed ln(idf) weights (1-ulp libm)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scored BM25 face: score(q,d) = Σ_t ln(idf)·tf_sat, top-3 docs
    per query (deterministic doc_id tiebreak).  The ranking is
    re-derived term-by-term in pure Python by tests/test_wave8.py (the
    text_tfidf_scored pattern)."""
    base = text_bm25(spark, sf_dir)
    scored = (
        base.withColumn(
            "part",
            F.log(F.col("idf_num").cast("double") / F.col("idf_den"))
            * F.col("tf_sat"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("part").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TOP_K)
        .select("query_id", "doc_id", "score", "rank")
    )


@query(
    "text_bm25_topk_contract",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, term
    ),
    mat AS (
      SELECT doc_id, term, tf,
             CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df,
             CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl
      FROM tf
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len({_DUCK_TOKS})) AS BIGINT) AS total_len
      FROM documents
    ),
    parts AS (
      SELECT CAST(qt.query_id AS BIGINT) AS query_id, m.doc_id,
             CAST(
               (CAST(2 * (t.n_docs - m.df) + 1 AS HUGEINT)
                * (22 * m.tf * t.total_len) * 1000000000000)
               // (CAST(2 * m.df + 1 AS HUGEINT)
                   * (10 * t.total_len * m.tf + 3 * t.total_len
                      + 9 * m.dl * t.n_docs))
               AS BIGINT) AS part_e12
      FROM mat m JOIN {_DUCK_QT} USING (term) CROSS JOIN tot t
    ),
    scored AS (
      SELECT query_id, doc_id,
             CAST(SUM(part_e12) AS BIGINT) AS score_e12
      FROM parts GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score_e12, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT query_id, doc_id, score_e12,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY score_e12 DESC, doc_id ASC
             ) AS rank
      FROM scored
    ) WHERE rank <= {_TOP_K}
    """,
)
def text_bm25_topk_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable BM25 top-k (the contract face `text_bm25_topk`
    lacked — round-7 verdict item 2): per-query top-3 ranked on a
    DECIMAL-EXACT score key, so the full selection — ranking, k cut,
    tiebreak — hash-matches across engines with no float anywhere.

    The key is the LINEAR-idf BM25 score Σ_t idf_t·tf_sat_t with the
    Robertson idf kept as the exact rational (2(N−df)+1)/(2df+1) rather
    than its ln — the linear-space analog of the ln-weighted face, the
    same move `curate_dsir_select_contract` makes for DSIR's
    log-likelihood weight (text/curation.py:1085).  Each term expands
    to 12 fractional decimal digits by exact long division (one-level
    ``num·10^12 DIV den`` — num/den are the hash-green int64 rationals
    `text_bm25` already carries), then sums as BIGINT: floor-then-sum
    is identical in both engines, so the score is bit-deterministic.
    The ln-faithful ranking stays in the rows-only `text_bm25_topk`
    with its pure-Python re-derivation test (tests/test_wave8.py).

    Overflow bound: the scaled numerator idf_num·tf_sat_num·10^12 ≈
    (2N)·(22·tf·total_len)·10^12 rides DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) — exact to ~4e34 ≈ 10^9-token corpora with 2e9
    docs; each per-term quotient ≈ 10^12·idf·tf_sat ≤ 2.2·10^12·N/df
    must fit BIGINT, which holds while N/df ≤ 4e5 (rarer query terms
    at larger N shift the scale factor to 10^9, same algebra).

    Scale shape: identical to `text_bm25` (one tokenize, one doc-term
    shuffle, broadcast query batch + totals) plus one (query,doc)
    aggregate over the |terms-in-batch|-sparse matched frame and a
    rank window partitioned BY QUERY over the already-reduced
    per-query candidate sets."""
    base = text_bm25(spark, sf_dir)
    part = F.expr(
        "CAST((CAST(idf_num AS DECIMAL(38,0)) * tf_sat_num"
        " * 1000000000000)"
        " DIV (CAST(idf_den AS DECIMAL(38,0)) * tf_sat_den) AS BIGINT)"
    )
    scored = (
        base.select("query_id", "doc_id", part.alias("part_e12"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("part_e12").cast("long").alias("score_e12"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_e12"), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TOP_K)
        .select(
            "query_id",
            "doc_id",
            "score_e12",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def bm25_reference(rows, n_docs: int, total_len: int) -> dict:
    """Pure-Python BM25 re-derivation over collected (query_id, doc_id,
    tf, df, dl) rows — the test-side mirror of text_bm25_topk."""
    scores: dict[tuple[int, int], float] = {}
    for r in rows:
        avgdl = total_len / n_docs
        tf_sat = (r["tf"] * 2.2) / (
            r["tf"] + 1.2 * (0.25 + 0.75 * r["dl"] / avgdl)
        )
        idf = math.log((n_docs - r["df"] + 0.5) / (r["df"] + 0.5))
        key = (r["query_id"], r["doc_id"])
        scores[key] = scores.get(key, 0.0) + idf * tf_sat
    return scores

"""RAKE keyword extraction (wave 11).

RAKE (Rose, Engel, Cramer & Cowley 2010 — Rapid Automatic Keyword
Extraction): candidate keyphrases are the maximal runs of non-stopword
tokens; each word scores deg(w)/freq(w), where freq(w) counts the
word's phrase-instance occurrences and deg(w) sums the lengths of the
phrases it occurs in (its within-phrase co-occurrence degree, self
included); a phrase scores the sum of its member words' scores.  Long
collocations outrank bare frequent words — the property tf-idf and raw
frequency both lack — making RAKE the standard cheap keyphrase tagger
for corpus exploration, faceted browsing, and weak topic labels next to
`text_tfidf` (importance) and `text_pmi_cooccur` (2-gram collocation).

`text_rake_keywords` emits the top-10 phrases per language.

Distributed shape (100 TB):

* Phrase segmentation is gaps-and-islands INSIDE each document: one
  doc-keyed window (pos − row_number over non-stop tokens) assigns an
  island id; phrase instances materialize as per-island ordered
  collect_lists.  One shuffle, keyed by doc.
* Word statistics (freq, deg) are VOCABULARY-keyed aggregates over the
  exploded phrase-word frame — sublinear in corpus, map-side partials.
* Phrase scoring runs over phrase TYPES (the distinct-text frame, also
  sublinear): the member words come back by re-splitting the phrase
  text — no instance-level fan-out ever re-joins the corpus — and the
  per-language top-10 is a WindowGroupLimit over bounded partitions.
* Cross-engine exactness: deg/freq is one int64 division; the phrase
  score folds through exact-decimal dsum (order-independent); ranking
  ties break on phrase text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.numeric import dsum, o_dsum
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.text.queries import (
    _DUCK_TOKS,
    _SPARK_TOKS,
    _STOPWORDS,
)

_TOP_K = 10

# one global stopword set (union of the per-language fixtures): RAKE
# segmentation must not depend on the lang column being trustworthy
_STOPS = tuple(sorted({w for ws in _STOPWORDS.values() for w in ws}))
_S_STOPS = "(" + ", ".join(f"'{w}'" for w in _STOPS) + ")"


@query(
    "text_rake_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, toks[r.i] AS tok, r.i AS pos
      FROM (SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents)
           CROSS JOIN UNNEST(range(1, len(toks) + 1)) AS r(i)
    ), nonstop AS (
      SELECT doc_id, lang, tok, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS island
      FROM tok WHERE tok NOT IN {_S_STOPS}
    ), inst AS MATERIALIZED (
      SELECT doc_id, lang,
             array_to_string(list(tok ORDER BY pos), ' ') AS phrase,
             CAST(COUNT(*) AS BIGINT) AS plen
      FROM nonstop GROUP BY doc_id, lang, island
    ), wstat AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg
      FROM (SELECT plen, unnest(string_split(phrase, ' ')) AS word
            FROM inst)
      GROUP BY word
    ), ptype AS (
      SELECT lang, phrase, MAX(plen) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS n_instances
      FROM inst GROUP BY lang, phrase
    ), pscore AS (
      SELECT t.lang, t.phrase,
             {o_dsum('CAST(w.deg AS DOUBLE) / CAST(w.freq AS DOUBLE)')}
               AS score
      FROM (SELECT lang, phrase,
                   unnest(string_split(phrase, ' ')) AS word
            FROM ptype) t
      JOIN wstat w USING (word)
      GROUP BY t.lang, t.phrase
    )
    SELECT lang, phrase, n_words, n_instances, score,
           CAST(rk AS BIGINT) AS rank
    FROM (
      SELECT p.lang, p.phrase, p.n_words, p.n_instances, s.score,
             ROW_NUMBER() OVER (
               PARTITION BY p.lang ORDER BY s.score DESC, p.phrase) AS rk
      FROM ptype p JOIN pscore s ON s.lang = p.lang AND s.phrase = p.phrase
    ) WHERE rk <= {_TOP_K}
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 RAKE keyphrases per language — see module docstring for
    the gaps-and-islands segmentation and the type-level score tables."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.posexplode(F.expr(_SPARK_TOKS)).alias("pos0", "tok"),
    ).select("doc_id", "lang", "tok", (F.col("pos0") + 1).alias("pos"))
    nonstop = tok.where(~F.col("tok").isin(*_STOPS)).select(
        "doc_id",
        "lang",
        "tok",
        "pos",
        (
            F.col("pos")
            - F.row_number().over(
                Window.partitionBy("doc_id").orderBy("pos")
            )
        ).alias("island"),
    )
    # the phrase-instance frame feeds wstat AND ptype; without
    # truncation both re-run the doc-keyed segmentation window
    # (measured: 5 Generates / 2 windows in the plan).  One checkpoint
    # = one segmentation pass; the frame is token-scale, the same
    # linear cost class as its input.
    inst = nonstop.groupBy("doc_id", "lang", "island").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    ).localCheckpoint(eager=True)
    wstat = (
        inst.select("plen", F.explode(F.split("phrase", " ")).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("deg"),
        )
    )
    ptype = inst.groupBy("lang", "phrase").agg(
        F.max("plen").alias("n_words"),
        F.count(F.lit(1)).alias("n_instances"),
    )
    pscore = (
        ptype.select("lang", "phrase",
                     F.explode(F.split("phrase", " ")).alias("word"))
        .join(wstat, "word")
        .groupBy("lang", "phrase")
        .agg(
            dsum(
                F.col("deg").cast("double") / F.col("freq").cast("double"),
                "score",
            )
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("phrase"))
    )
    return (
        ptype.join(pscore, ["lang", "phrase"])
        .withColumn("rank", rk.cast("bigint"))
        .where(F.col("rank") <= _TOP_K)
        .select("lang", "phrase", "n_words", "n_instances", "score", "rank")
    )

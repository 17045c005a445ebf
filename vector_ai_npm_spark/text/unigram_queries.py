"""Registry faces for the unigram-LM tokenizer (text/unigram_lm.py).

Three faces, the BPE split (text/queries.py:417-545) applied to EM:
the float-iterative trainer declares rows-only; the SQL-checkable
guarantees are the seed scorer's argmax (pure substring counting) and
the Viterbi encode's segmentation contract (segmentation-invariant
integers/booleans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_VOCAB_SIZE = 128
_MAX_PIECE = 4
_SEED_SIZE = 512


@query("tokenizer_unigram_train")  # rows-only: EM probabilities are float
def tokenizer_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained unigram-LM vocabulary: top pieces by probability
    (piece, n_chars, logp rounded).  Iterative EM — not SQL-
    expressible; the cross-engine value checks are
    `unigram_seed_argmax` (seeding) and `unigram_encode_contract`
    (segmentation), and the trainer itself is pinned against a
    pure-Python reference in tests/test_unigram_lm.py."""
    from vector_ai_npm_spark.text.unigram_lm import train_unigram

    docs = load_table(spark, sf_dir, "documents")
    logp = train_unigram(
        docs, vocab_size=_VOCAB_SIZE, max_piece_len=_MAX_PIECE,
        seed_size=_SEED_SIZE,
    )
    top = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))[:32]
    return spark.createDataFrame(
        [(p, len(p), round(lp, 6)) for p, lp in top],
        "piece string, n_chars int, logp double",
    )


@query(
    "unigram_seed_argmax",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
      FROM documents
    ), v AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
      FROM w WHERE w <> '' GROUP BY w
    ), subs AS (
      SELECT substring(w, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece,
             freq
      FROM v,
           UNNEST(range(1, length(w) + 1)) AS t(i),
           UNNEST(range(2, {_MAX_PIECE} + 1)) AS u(l)
      WHERE CAST(i AS INTEGER) + CAST(l AS INTEGER) - 1 <= length(w)
    )
    SELECT piece, CAST(SUM(freq) AS BIGINT) AS score
    FROM subs GROUP BY piece
    ORDER BY score DESC, piece ASC
    LIMIT 8
    """,
)
def unigram_seed_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram trainer's seed decision as a VALUE-level cross-engine
    check (the bpe_round1_argmax pattern): the top-8 multi-char seed
    candidates by total corpus occurrence count — overlapping substring
    positions over the word dictionary, word-frequency weighted, with
    the (score desc, piece asc) tiebreak.  DuckDB recomputes the exact
    substring explosion, so a tokenize/seeding/tiebreak regression
    changes a row and fails the hash."""
    from vector_ai_npm_spark.text.bpe import word_vocab
    from vector_ai_npm_spark.text.unigram_lm import seed_candidates

    docs = load_table(spark, sf_dir, "documents")
    return (
        seed_candidates(
            word_vocab(docs).select("w", "freq"),
            max_piece_len=_MAX_PIECE, seed_size=_SEED_SIZE,
        )
        .where(F.length("piece") >= 2)
        .orderBy(F.col("score").desc(), F.col("piece").asc())
        .limit(8)
    )


@query(
    "unigram_encode_contract",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
      FROM documents
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(w)) AS BIGINT) AS n_chars,
           TRUE AS reconstruct_ok
    FROM w WHERE w <> '' GROUP BY doc_id
    """,
)
def unigram_encode_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi-encode contract (the bpe_encode_contract pattern): a
    unigram segmentation must reconstruct every word, so per document
    (a) no word is lost in the dictionary join, (b) summed token chars
    equal summed word chars, (c) every word's pieces concatenate back
    to it.  These hold for ANY best segmentation, so float tie-breaks
    in the lattice can never flip a contract column — which is exactly
    what makes this face hash-checkable while the trainer is not.
    Corpus text never enters Python: encode runs over the dictionary,
    documents re-join on the word (the BPE encode discipline)."""
    from vector_ai_npm_spark.text.unigram_lm import (
        train_unigram,
        unigram_encode_dictionary,
    )

    docs = load_table(spark, sf_dir, "documents")
    logp = train_unigram(
        docs, vocab_size=_VOCAB_SIZE, max_piece_len=_MAX_PIECE,
        seed_size=_SEED_SIZE,
    )
    dic = unigram_encode_dictionary(docs, logp, _MAX_PIECE).select(
        "w",
        F.concat_ws("", F.col("toks")).alias("joined"),
        F.aggregate(
            F.transform(F.col("toks"), lambda t: F.length(t)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("tok_chars"),
    )
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w"),
    ).where(F.col("w") != "")
    return (
        words.join(dic, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("tok_chars").cast("long").alias("n_chars"),
            F.expr("bool_and(joined = w)").alias("reconstruct_ok"),
        )
    )

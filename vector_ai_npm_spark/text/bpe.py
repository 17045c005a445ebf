"""BPE merge-pair training — the tokenizer-training corpus job.

Reference context: the reference counts tokens only implicitly through
OpenAI's embedding API; a training-data platform additionally TRAINS
tokenizers on its corpus (byte-pair encoding: Sennrich et al.,
ACL 2016 — the GPT/Llama tokenizer family's core loop).

The distributed shape is what matters at 100 TB: classic BPE trainers
operate on the WORD-FREQUENCY dictionary, not the corpus. So:

  1. ONE corpus-scale pass: tokenize + word count (map-side combined
     hash agg) → a vocab-sized frame (`w`, `freq`, `toks`), persisted.
  2. k merge rounds, each a VOCAB-scale job: adjacent-pair frequencies
     (weighted by word freq) → global argmax (deterministic (freq
     desc, pair asc) tiebreak, a 1-row TakeOrdered) → apply the merge
     to the token arrays (Arrow-batched, greedy left-to-right
     non-overlapping — the standard BPE merge rule).

  Corpus size only ever affects step 1; the training loop costs
  O(k × vocab) regardless of whether the corpus is 5 GB or 100 TB.
  Each round's frame is persisted and its predecessor unpersisted, so
  lineage never re-applies earlier merges.
"""

from __future__ import annotations

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_pair_udf(left: str, right: str):
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("array<string>")
    def _merge(toks: pd.Series) -> pd.Series:
        def one(ts):
            out, i, n = [], 0, len(ts)
            while i < n:
                if i + 1 < n and ts[i] == left and ts[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(ts[i])
                    i += 1
            return out

        return toks.map(lambda ts: one(list(ts)))

    return _merge


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, toks=chars) — the dictionary BPE trains on."""
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w")
    ).where(F.col("w") != "")
    return (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "toks",
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
        )
    )


def pair_frequencies(vocab: DataFrame) -> DataFrame:
    """Adjacent-token pair frequencies over the (weighted) vocab."""
    return (
        vocab.where(F.size("toks") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(toks[i-1] AS l, toks[i] AS r))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("pair_left"), F.col("p.r").alias("pair_right"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def train_bpe_merges(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """Learn the first `n_merges` BPE merges; returns a k-row DataFrame
    (merge_round, pair_left, pair_right, merged, pair_freq)."""
    spark = docs.sparkSession
    cur = word_vocab(docs, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for r in range(1, n_merges + 1):
            best = (
                pair_frequencies(cur)
                .orderBy(
                    F.col("pair_freq").desc(),
                    F.col("pair_left").asc(),
                    F.col("pair_right").asc(),
                )
                .limit(1)
                .collect()
            )
            if not best:
                break
            left, right, pf = best[0]
            merges.append((r, left, right, left + right, int(pf)))
            nxt = cur.withColumn(
                "toks", _merge_pair_udf(left, right)(F.col("toks"))
            ).persist(StorageLevel.MEMORY_AND_DISK)
            nxt.count()  # materialize before dropping the parent
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_round long, pair_left string, pair_right string, "
        "merged string, pair_freq long",
    )


def _apply_merges_udf(merges: list[tuple[str, str]]):
    """Arrow UDF applying a trained merge list to char-split words, in
    rank order with the SAME greedy left-to-right non-overlapping rule
    the trainer used — so a training-corpus word encodes to exactly the
    token sequence the trainer's final dictionary holds."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("array<string>")
    def _encode(toks: pd.Series) -> pd.Series:
        def one(ts):
            for left, right in merges:
                out, i, n = [], 0, len(ts)
                while i < n:
                    if i + 1 < n and ts[i] == left and ts[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(ts[i])
                        i += 1
                ts = out
            return ts

        return toks.map(lambda ts: one(list(ts)))

    return _encode


def bpe_encode_dictionary(
    docs: DataFrame, merges: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Encode the corpus DICTIONARY (distinct words), not the corpus:
    returns (w, toks) with the trained merges applied.

    This is the tokenizer-apply scale shape: the Arrow encode pass runs
    over vocab-sized input (≤ a few million words at any corpus size);
    per-document token streams come from joining token counts back to
    the exploded words — the 100 TB text itself never enters Python.
    The merge table (k rows) ships to workers inside the UDF closure,
    exactly how production tokenizers distribute a merges file."""
    ranked = [
        (r.pair_left, r.pair_right)
        for r in merges.orderBy("merge_round").collect()
    ]
    dictionary = word_vocab(docs, text_col).select("w", "toks")
    return dictionary.withColumn(
        "toks", _apply_merges_udf(ranked)(F.col("toks"))
    )

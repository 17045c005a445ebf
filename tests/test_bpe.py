"""BPE trainer: the distributed merge loop must equal a pure-Python
reference implementation round-for-round (values, not just shapes)."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F


def _reference_bpe(word_freq: dict[str, int], n_merges: int):
    """Textbook BPE on a word-frequency dict: argmax adjacent pair
    (freq desc, pair asc), greedy left-to-right non-overlapping merge."""
    vocab = {w: [c for c in w] for w in word_freq}
    out = []
    for r in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, toks in vocab.items():
            f = word_freq[w]
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (left, right), pf = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((r, left, right, left + right, pf))
        for w, toks in vocab.items():
            merged, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            vocab[w] = merged
    return out


def _word_freq(texts) -> dict[str, int]:
    c: Counter = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                c[w] += 1
    return dict(c)


def test_bpe_equals_reference_on_fixture(spark, sf_smoke):
    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.text.bpe import train_bpe_merges

    docs = load_table(spark, sf_smoke, "documents")
    got = [
        (r.merge_round, r.pair_left, r.pair_right, r.merged, r.pair_freq)
        for r in train_bpe_merges(docs, n_merges=8).collect()
    ]
    texts = [r[0] for r in docs.select("text").collect()]
    want = _reference_bpe(_word_freq(texts), 8)
    assert got == want


def test_bpe_planted_corpus(spark):
    """Classic Sennrich example family: 'low lower lowest' — the first
    merges must assemble the shared stem deterministically."""
    from vector_ai_npm_spark.text.bpe import train_bpe_merges

    docs = spark.createDataFrame(
        [(1, "low low low lower lower lowest")], "doc_id long, text string"
    )
    got = [
        (r.merge_round, r.merged, r.pair_freq)
        for r in train_bpe_merges(docs, n_merges=3).collect()
    ]
    want = [
        (r, m, f)
        for r, _l, _r, m, f in _reference_bpe(
            _word_freq(["low low low lower lower lowest"]), 3
        )
    ]
    assert got == want
    # the stem 'lo'/'low' must appear among the first merges
    assert any(m in ("lo", "low") for _r, m, _f in got), got


def test_admit_batch_property_equivalence():
    """The exact-mode batch rule must be sequential-equivalent on random
    word-frequency dicts: simulate the trainer driver-side (no Spark)
    with _admit_batch and compare merge lists to the textbook loop.
    Small alphabets maximize symbol collisions — the adversarial case
    for batching."""
    import random

    from vector_ai_npm_spark.text.bpe import _admit_batch

    def batched(word_freq, n_merges, batch_size=128):
        vocab = {w: list(w) for w in word_freq}
        out = []
        while len(out) < n_merges:
            pairs: Counter = Counter()
            for w, toks in vocab.items():
                f = word_freq[w]
                for a, b in zip(toks, toks[1:]):
                    pairs[(a, b)] += f
            if not pairs:
                break
            remaining = n_merges - len(out)
            k = max(64, 4 * min(batch_size, remaining))
            top = sorted(
                ((left, right, f) for (left, right), f in pairs.items()),
                key=lambda t: (-t[2], t[0], t[1]),
            )[:k]
            base = len(out)
            batch = _admit_batch(top, min(batch_size, remaining))
            out.extend(
                (base + i + 1, left, right, left + right, f)
                for i, (left, right, f) in enumerate(batch)
            )
            for left, right, _f in batch:
                for w, toks in vocab.items():
                    merged, i = [], 0
                    while i < len(toks):
                        if (
                            i + 1 < len(toks)
                            and toks[i] == left
                            and toks[i + 1] == right
                        ):
                            merged.append(left + right)
                            i += 2
                        else:
                            merged.append(toks[i])
                            i += 1
                    vocab[w] = merged
        return out

    rng = random.Random(20260814)
    for _trial in range(120):
        alpha = rng.choice(["ab", "abc", "abcde", "abcdefgh"])
        wf: dict[str, int] = {}
        for _ in range(rng.randint(3, 60)):
            w = "".join(
                rng.choice(alpha) for _ in range(rng.randint(1, 10))
            )
            wf[w] = wf.get(w, 0) + rng.randint(1, 20)
        n = rng.randint(1, 40)
        assert batched(wf, n) == _reference_bpe(wf, n)


def test_batched_trainer_rounds_sublinear(spark, sf_smoke):
    """Round-5 verdict item 4: training must not cost one Spark job per
    merge. In approximate (disjoint-batch) mode the fixture corpus
    trains its full mergeable vocab in rounds ≪ merges; the merges are
    still valid rank-ordered BPE merges (merged token = left+right,
    positive weighted frequency)."""
    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.text.bpe import train_bpe_merges

    docs = load_table(spark, sf_smoke, "documents")
    stats: dict = {}
    merges = train_bpe_merges(
        docs, n_merges=64, exact=False, stats=stats
    ).collect()
    assert stats["merges"] == len(merges) == 64
    assert stats["rounds"] * 3 <= stats["merges"], stats
    assert [r.merge_round for r in merges] == list(range(1, 65))
    assert all(r.merged == r.pair_left + r.pair_right for r in merges)
    assert all(r.pair_freq > 0 for r in merges)


def test_encode_dictionary_equals_reference(spark, sf_smoke):
    """Applying the trained merges via the distributed dictionary encode
    must yield exactly the token sequences the pure-Python trainer's
    final vocab holds (same merges, same greedy rule ⇒ same segments)."""
    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.text.bpe import (
        bpe_encode_dictionary,
        train_bpe_merges,
    )

    docs = load_table(spark, sf_smoke, "documents")
    texts = [r.text for r in docs.select("text").collect()]
    wf = _word_freq(texts)

    # reference: replay the reference merges over the reference vocab
    vocab = {w: [c for c in w] for w in wf}
    for _r, left, right, _m, _f in _reference_bpe(wf, 8):
        for w, toks in vocab.items():
            merged, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            vocab[w] = merged

    merges = train_bpe_merges(docs, n_merges=8)
    got = {
        r.w: list(r.toks)
        for r in bpe_encode_dictionary(docs, merges).collect()
    }
    assert got == vocab

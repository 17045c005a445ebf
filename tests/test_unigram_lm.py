"""Unigram-LM tokenizer (text/unigram_lm.py): distributed trainer vs a
pure-Python reference (the test_bpe.py pattern), plus lattice and
contract properties."""

from __future__ import annotations

import math

import pytest


# ---------------------------------------------------------------------------
# pure-Python reference trainer (same algorithm, no Spark)
# ---------------------------------------------------------------------------


def _ref_train(word_freqs, vocab_size=128, max_len=4, seed_size=512,
               em_rounds=2):
    from vector_ai_npm_spark.text.unigram_lm import _forward_backward

    # seed: all substrings, overlapping positions, freq-weighted
    score: dict[str, int] = {}
    for w, f in word_freqs.items():
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                p = w[i : i + l]
                score[p] = score.get(p, 0) + f
    chars = {p: s for p, s in score.items() if len(p) == 1}
    multi = sorted(
        ((p, s) for p, s in score.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_size]
    kept = dict(chars) | dict(multi)
    total = sum(kept.values())
    logp = {p: math.log(s / total) for p, s in kept.items()}

    def em(cur):
        acc: dict[str, float] = {}
        for w, f in word_freqs.items():
            exp, _ = _forward_backward(w, cur, max_len)
            for p, c in exp.items():
                acc[p] = acc.get(p, 0.0) + c * f
        tot = sum(acc.values())
        out = {p: math.log(c / tot) for p, c in acc.items() if c > 0.0}
        for p in chars:
            out.setdefault(p, math.log(1e-12))
        return out

    for _ in range(em_rounds):
        logp = em(logp)
    ch = {p: lp for p, lp in logp.items() if len(p) == 1}
    mu = sorted(
        ((p, lp) for p, lp in logp.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, vocab_size - len(ch))]
    logp = dict(ch) | dict(mu)
    final = em(logp)
    for p in ch:
        final.setdefault(p, math.log(1e-12))
    return final


def test_trainer_matches_pure_python_reference(spark, sf_smoke):
    """Same corpus, same algorithm: the distributed trainer must learn
    the same piece vocabulary with the same probabilities (up to
    summation-order float noise)."""
    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.text.bpe import word_vocab
    from vector_ai_npm_spark.text.unigram_lm import train_unigram

    docs = load_table(spark, sf_smoke, "documents")
    wf = {
        r["w"]: r["freq"]
        for r in word_vocab(docs).select("w", "freq").collect()
    }
    got = train_unigram(docs, vocab_size=64, max_piece_len=4,
                        seed_size=256, em_rounds=2)
    want = _ref_train(wf, vocab_size=64, max_len=4, seed_size=256,
                      em_rounds=2)
    assert set(got) == set(want)
    worst = max(abs(got[p] - want[p]) for p in got)
    assert worst < 1e-8, f"max |dlogp| = {worst}"


def test_trainer_guards_seed_size_driver_bound(spark, sf_smoke):
    """seed_size past _MAX_SEED_SIZE must fail loudly (the per-round
    piece-table collect is driver state), not silently thrash."""
    import pytest

    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.text.unigram_lm import (
        _MAX_SEED_SIZE,
        train_unigram,
    )

    docs = load_table(spark, sf_smoke, "documents")
    with pytest.raises(ValueError, match="seed_size"):
        train_unigram(docs, seed_size=_MAX_SEED_SIZE + 1)


def test_forward_backward_is_a_distribution():
    """On a closed 2-char alphabet the expected counts must be finite
    and the likelihood of a word must upper-bound its best path."""
    from vector_ai_npm_spark.text.unigram_lm import (
        _forward_backward,
        _viterbi,
    )

    logp = {"a": math.log(0.3), "b": math.log(0.3), "ab": math.log(0.4)}
    exp, z = _forward_backward("abab", logp, 2)
    assert z > float("-inf")
    # 'ab' used twice in the best segmentation; expectation must be >1
    assert exp["ab"] > 1.0
    toks = _viterbi("abab", logp, 2)
    assert toks == ["ab", "ab"]
    best_score = sum(logp[t] for t in toks)
    assert z >= best_score  # sum over paths >= best path
    # degenerate: unsegmentable word
    exp2, z2 = _forward_backward("abc", {"a": 0.0}, 2)
    assert z2 == float("-inf") and exp2 == {}


def test_viterbi_tiebreak_deterministic():
    from vector_ai_npm_spark.text.unigram_lm import _viterbi

    # two equal-score segmentations: [xy, z] vs [x, yz]; rule prefers
    # the longer LAST piece
    lp = {"x": math.log(0.25), "z": math.log(0.25),
          "xy": math.log(0.25), "yz": math.log(0.25),
          "y": math.log(0.25)}
    assert _viterbi("xyz", lp, 2) == ["x", "yz"]


def test_encode_contract_properties(spark, sf_smoke):
    from vector_ai_npm_spark import registry

    rows = registry.run("unigram_encode_contract", spark, sf_smoke).collect()
    assert rows and all(r.reconstruct_ok for r in rows)
    assert all(r.n_chars >= r.n_words for r in rows)


def test_seed_argmax_multi_char_only(spark, sf_smoke):
    from vector_ai_npm_spark import registry

    rows = registry.run("unigram_seed_argmax", spark, sf_smoke).collect()
    assert len(rows) == 8
    assert all(len(r.piece) >= 2 for r in rows)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_train_face_compresses(spark, sf_smoke):
    """The learned vocab must contain multi-char pieces with higher
    probability than some single chars — i.e. EM actually moved mass
    onto subwords (a trainer that never learns anything would return
    chars only)."""
    from vector_ai_npm_spark import registry

    rows = registry.run("tokenizer_unigram_train", spark, sf_smoke).collect()
    assert any(r.n_chars >= 2 for r in rows)
    assert all(r.logp <= 0.0 for r in rows)

"""Wave-23 operators: centroid drift and vocabulary overlap —
re-derived against driver-side references."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict
from fractions import Fraction

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


def _half(vec_id: int) -> int:
    h = hashlib.md5(f"{vec_id}#drift".encode()).hexdigest()[:8]
    return int(h, 16) % 2


def test_centroid_drift_identities_and_float_reference(spark, sf_oracle):
    """The emitted cosine must equal the identity recomputed from the
    exact integer components, and sit within micro-quantization
    distance of a full-precision float centroid cosine."""
    emb = load_table(spark, sf_oracle, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    by = defaultdict(lambda: [([], []), ([], [])])  # label -> per-half rows
    for r in emb.collect():
        h = _half(r.vec_id)
        by[r.label][h][0].append(r.vec_id)
        by[r.label][h][1].append([float(v) for v in r.embedding])
    got = {
        r.label: r
        for r in registry.run(
            "embedding_centroid_drift", spark, sf_oracle
        ).collect()
    }
    assert set(got) == set(by)
    for label, ((ids_a, va), (ids_b, vb)) in by.items():
        r = got[label]
        assert (r.n_a, r.n_b) == (len(ids_a), len(ids_b))
        # exact identity from the emitted integers
        denom = math.sqrt(float(r.norm_a2_u2 * r.norm_b2_u2))
        assert r.cosine == r.dot_u2 / denom
        assert -1.0 <= r.cosine <= 1.0
        # full-precision float reference (quantization tolerance)
        dim = len(va[0])
        ca = [sum(v[d] for v in va) / len(va) for d in range(dim)]
        cb = [sum(v[d] for v in vb) / len(vb) for d in range(dim)]
        dot = sum(x * y for x, y in zip(ca, cb))
        ref = dot / math.sqrt(
            sum(x * x for x in ca) * sum(y * y for y in cb)
        )
        assert abs(r.cosine - ref) < 2e-3, (label, r.cosine, ref)


def test_vocab_overlap_matches_set_reference(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents").select("source", "text")
    vocab = defaultdict(set)
    for r in docs.collect():
        toks = [t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t]
        vocab[r.source].update(toks)
    sources = sorted(vocab)
    got = {
        (r.source_a, r.source_b): r
        for r in registry.run(
            "text_vocab_overlap", spark, sf_oracle
        ).collect()
    }
    expected = {
        (a, b)
        for i, a in enumerate(sources)
        for b in sources[i + 1 :]
        if vocab[a] & vocab[b]
    }
    assert set(got) == expected
    for (a, b), r in got.items():
        inter = len(vocab[a] & vocab[b])
        union = len(vocab[a] | vocab[b])
        assert (r.vocab_a, r.vocab_b, r.common_words) == (
            len(vocab[a]), len(vocab[b]), inter,
        )
        assert Fraction(r.jac_num, r.jac_den) == Fraction(inter, union)
        assert 0 < r.jaccard <= 1

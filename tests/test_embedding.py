"""A5 invariants (SURVEY §5.2): dim constant, unit norm, determinism,
token-overlap ⇒ similarity. The vector values are model-defined (no SQL
oracle), so these tests ARE the correctness contract for the embedder.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from vector_ai_npm_spark.embedding.hashing import embed_text_py, hashing_embedder


def _cos(a, b):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_dim_and_unit_norm():
    v = embed_text_py("the quick brown fox", dim=64)
    assert len(v) == 64
    assert math.isclose(float(np.linalg.norm(v)), 1.0, rel_tol=1e-5)


def test_deterministic():
    assert embed_text_py("same text twice") == embed_text_py("same text twice")


def test_self_similarity_is_one():
    v = embed_text_py("hello world foo bar")
    assert math.isclose(_cos(v, v), 1.0, rel_tol=1e-9)


def test_token_overlap_beats_disjoint():
    a = embed_text_py("alpha beta gamma delta epsilon")
    b = embed_text_py("alpha beta gamma delta zeta")      # 4/5 shared
    c = embed_text_py("one two three four five")          # 0/5 shared
    assert _cos(a, b) > _cos(a, c)


def test_empty_and_null():
    assert embed_text_py(None) is None
    v = embed_text_py("")
    assert v == [0.0] * 64  # zero vector, not normalized (norm 0 guard)


def test_spark_udf_matches_pure_python(spark):
    texts = ["hello world", "spark and duckdb", "", "hello world"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    out = {r.i: r.v for r in df.select("i", hashing_embedder()("t").alias("v")).collect()}
    for i, t in enumerate(texts):
        assert out[i] == pytest.approx(embed_text_py(t), abs=1e-7)
    assert out[0] == out[3]  # same text, same vector, across Arrow batches

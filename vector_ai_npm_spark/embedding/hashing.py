"""A5 — deterministic hashing-trick embedder (Arrow-batched).

Reference behavior (vector-client.ts:375-388 `createEmbeddings`): each
chunk's text goes to OpenAI ada-002 and comes back as a 1536-dim float
vector; the caller formats the input as ``HEADER: {h} | CONTENT: {c}``
with the leading '## ' stripped (:298-301).

This engine cannot (and per BASELINE.json should not) call OpenAI, so the
embedding stage is a pluggable deterministic local model behind the same
operator interface: the classic feature-hashing text embedder —
crc32(token) → bucket, sign bit from the hash, L2-normalized. Properties
the tests pin: fixed dim, unit norm, identical text ⇒ identical vector,
token-overlap ⇒ cosine similarity (meaningful neighbors for A7/B9).

Scale shape: pandas_udf ⇒ one Arrow batch per ~10k rows crosses the
Python boundary, numpy does the math. Embedding is per-row independent —
no shuffle, linear scale-out; at 100 TB this is the map stage before the
partitioned store write (A6). A real model swaps in behind the same
``ARRAY<FLOAT>`` contract (batched ONNX/API inference per partition).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

_TOKEN_RE = re.compile(r"[a-z0-9]+")

DEFAULT_DIM = 64  # fixtures are 64-dim; 1536 for ada-002 parity


def embed_text_py(text: str | None, dim: int = DEFAULT_DIM) -> list[float] | None:
    """Pure-Python single-row embedder (unit-testable without Spark)."""
    if text is None:
        return None
    v = np.zeros(dim, dtype=np.float64)
    for m in _TOKEN_RE.finditer(text.lower()):
        h = zlib.crc32(m.group().encode("utf-8"))
        sign = -1.0 if (h >> 31) & 1 else 1.0
        v[h % dim] += sign
    n = float(np.linalg.norm(v))
    if n > 0.0:
        v /= n
    return [float(x) for x in v.astype(np.float32)]


def hashing_embedder(dim: int = DEFAULT_DIM):
    """pandas_udf: STRING → ARRAY<FLOAT> (the A5 operator).

    Batch-vectorized: one regex pass (pandas str.findall), one crc32
    sweep, one np.add.at scatter for the whole Arrow batch — ~3× the
    per-row map. Bit-identical to embed_text_py: the scatter adds ±1
    integers (exact in float64, order-independent), then the same
    normalize + float32 cast.
    """

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        n = len(texts)
        null_mask = texts.isna()
        toks = texts.fillna("").str.lower().str.findall("[a-z0-9]+")
        lens = toks.map(len).to_numpy(dtype=np.int64)
        flat = [t for row in toks for t in row]
        M = np.zeros((n, dim), dtype=np.float64)
        if flat:
            h = np.fromiter(
                (zlib.crc32(t.encode("utf-8")) for t in flat),
                dtype=np.uint32, count=len(flat),
            ).astype(np.int64)
            rows = np.repeat(np.arange(n), lens)
            sign = np.where((h >> 31) & 1, -1.0, 1.0)
            np.add.at(M, (rows, h % dim), sign)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0.0] = 1.0
        M = (M / norms[:, None]).astype(np.float32)
        out = pd.Series([row.tolist() for row in M])
        out[null_mask.to_numpy()] = None
        return out

    return _embed


def embed_input_expr(header: Column | str, content: Column | str) -> Column:
    """A5 input formatting (vector-client.ts:298-301): strip the leading
    '## ' from the header, then ``HEADER: {h} | CONTENT: {c}``.
    JVM-side string expression — oracle-checkable."""
    h = F.col(header) if isinstance(header, str) else header
    c = F.col(content) if isinstance(content, str) else content
    return F.format_string(
        "HEADER: %s | CONTENT: %s", F.regexp_replace(h, "^## ", ""), c
    )

"""B29 UDF-surface invariants: each extension point's Python semantics
verified against plain-Python recomputation on collected rows."""

from __future__ import annotations

import re

import pytest

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


@pytest.fixture(scope="module")
def out_rows(spark, sf_smoke):
    docs = {r.doc_id: r for r in load_table(spark, sf_smoke, "documents").collect()}
    rows = registry.run("udf_surface", spark, sf_smoke).collect()
    return docs, rows


def test_scalar_udf_semantics(out_rows):
    docs, rows = out_rows
    for r in rows[:50]:
        assert r.first_token == docs[r.doc_id].text.split(" ", 1)[0].upper()


def test_pandas_udf_semantics(out_rows):
    docs, rows = out_rows
    for r in rows[:50]:
        assert r.n_vowels == len(re.findall("[aeiou]", docs[r.doc_id].text))


def test_udtf_explode_counts(out_rows):
    docs, rows = out_rows
    for r in rows[:50]:
        assert r.n_ngrams == max(0, len(docs[r.doc_id].text[:12]) - 2)


def test_apply_in_pandas_zscores_by_group(out_rows):
    docs, rows = out_rows
    # z-scores within each lang must average ~0 (per-group normalization)
    from collections import defaultdict

    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r.chars_z)
    for lang, zs in by_lang.items():
        assert abs(sum(zs) / len(zs)) < 1e-6, f"lang {lang} z-mean off"

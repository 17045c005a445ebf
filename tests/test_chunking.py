"""Reference-semantics unit fixtures for A1–A4 (SURVEY §5.4).

Tiny literal MDX strings exercising each §2A quirk, plus pure-Python
splitter invariants (no Spark needed for those).
"""

from __future__ import annotations

import pytest

from vector_ai_npm_spark.chunking.recursive import recursive_split
from vector_ai_npm_spark.chunking.mdx import split_mdx_headers, validate_context


# ---------------------------------------------------------------------------
# pure-Python recursive splitter (A3)
# ---------------------------------------------------------------------------


def test_small_text_passes_through():
    assert recursive_split("hello", 10, 2) == ["hello"]


def test_empty_text_yields_nothing():
    assert recursive_split("", 10, 2) == []


@pytest.mark.parametrize("size,overlap", [(120, 30), (1000, 200), (50, 10)])
def test_pieces_respect_chunk_size_on_wordy_text(size, overlap):
    text = " ".join(f"word{i}" for i in range(500))
    pieces = recursive_split(text, size, overlap)
    assert pieces, "splitter returned nothing"
    assert all(len(p) <= size for p in pieces)
    # lossless modulo overlap: every piece is a substring of the input
    assert all(p.strip() and p in text for p in pieces)


def test_paragraph_ladder_prefers_paragraph_breaks():
    text = ("A" * 40 + "\n\n") * 5
    pieces = recursive_split(text.rstrip(), 100, 0)
    # paragraph separator splits cleanly; no piece straddles a \n\n break mid-A-run
    assert all(len(p) <= 100 for p in pieces)
    assert all("A" * 40 in p for p in pieces)


def test_unsplittable_run_falls_to_char_ladder():
    text = "X" * 250
    pieces = recursive_split(text, 100, 20)
    assert all(len(p) <= 100 for p in pieces)
    assert "".join(p[20:] if i else p for i, p in enumerate(pieces)).startswith("X" * 100)


def test_overlap_carries_tail_context():
    text = " ".join(f"w{i:03d}" for i in range(100))
    pieces = recursive_split(text, 60, 20)
    for a, b in zip(pieces, pieces[1:]):
        # the head of each following piece re-appears at the tail of the previous
        head = b[:10].strip()
        assert head.split(" ")[0] in a or len(a) < 60


# ---------------------------------------------------------------------------
# Spark-side header split semantics (A1/A2) on literal fixtures
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mdx_fixture_df(spark):
    rows = [
        # 1: well-formed
        (1, "## Context\nctx text\n## Alpha\nalpha body\n### Beta!\nbeta body"),
        # 2: first section is NOT ## Context (A2 must flag)
        (2, "## Intro\nhi\n## Alpha\nbody"),
        # 3: headers at depths 1..6 with punctuation
        (3, "## Context\nc\n# H1\na\n#### H4 (x, y)\nb\n###### H6 z?\nd"),
        # 4: consecutive headers (empty content between)
        (4, "## Context\nc\n## A\n## B\nbody b"),
        # 5: '#' mid-line is still a split point (reference regex has no ^ anchor)
        (5, "## Context\nstart ## Inline h\ntail"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "mdx"])


def test_header_split_basic(spark, mdx_fixture_df):
    out = split_mdx_headers(mdx_fixture_df)
    d1 = {r.chunk_id: r for r in out.where("doc_id = 1").collect()}
    assert [d1[i].header for i in sorted(d1)] == ["## Context", "## Alpha", "### Beta!"]
    assert d1[1].content == "ctx text\n"
    assert d1[2].prev_header == "## Context"
    assert d1[2].next_header == "### Beta!"
    assert d1[3].next_header is None
    assert d1[1].prev_header is None


def test_header_depths_1_to_6(spark, mdx_fixture_df):
    out = split_mdx_headers(mdx_fixture_df).where("doc_id = 3")
    headers = [r.header for r in out.orderBy("chunk_id").collect()]
    assert headers == ["## Context", "# H1", "#### H4 (x, y)", "###### H6 z?"]


def test_consecutive_headers_give_empty_content(spark, mdx_fixture_df):
    out = split_mdx_headers(mdx_fixture_df).where("doc_id = 4")
    rows = {r.header: r.content for r in out.collect()}
    assert rows["## A"] == ""
    assert rows["## B"] == "body b"


def test_midline_header_splits(spark, mdx_fixture_df):
    # faithful to the unanchored reference regex /#{1,6} .+\n/
    out = split_mdx_headers(mdx_fixture_df).where("doc_id = 5")
    headers = [r.header for r in out.orderBy("chunk_id").collect()]
    assert headers == ["## Context", "## Inline h"]


def test_validate_context_flags(spark, mdx_fixture_df):
    flags = {
        r.doc_id: r.is_valid_doc
        for r in validate_context(split_mdx_headers(mdx_fixture_df)).collect()
    }
    assert flags[1] and flags[3] and flags[4] and flags[5]
    assert not flags[2]


def test_validate_context_strict_raises(spark, mdx_fixture_df):
    chunks = split_mdx_headers(mdx_fixture_df)
    with pytest.raises(ValueError, match="## Context"):
        validate_context(chunks, strict=True)

"""Property-based invariants for the recursive splitter (A3) — the one
operator whose semantics live entirely in Python, so it gets the
heaviest correctness artillery (hypothesis over arbitrary text)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from vector_ai_npm_spark.chunking.recursive import recursive_split

TEXT = st.text(alphabet="ab \n", min_size=0, max_size=600)
SIZES = st.integers(min_value=10, max_value=200)


@settings(max_examples=200, deadline=None)
@given(text=TEXT, size=SIZES)
def test_pieces_never_exceed_size_when_separable(text, size):
    """Any piece longer than chunk_size must be an unbroken run with no
    separator inside (the only legal overflow)."""
    for p in recursive_split(text, size, size // 4):
        if len(p) > size:
            assert " " not in p and "\n" not in p, (
                f"oversized piece {len(p)} contains separators: {p[:80]!r}"
            )


@settings(max_examples=200, deadline=None)
@given(text=TEXT, size=SIZES)
def test_every_piece_is_a_substring(text, size):
    for p in recursive_split(text, size, size // 4):
        assert p in text


@settings(max_examples=200, deadline=None)
@given(text=TEXT, size=SIZES)
def test_coverage_no_content_lost(text, size):
    """Every non-separator character position of the input is covered by
    at least one piece (pieces overlap but never drop content)."""
    pieces = recursive_split(text, size, size // 4)
    if not text.strip():
        return
    # greedy scan: all pieces must appear in order, jointly spanning the text
    pos = 0
    for p in pieces:
        # latest occurrence that still starts at or before the first
        # uncovered position — plain find() picks an earlier duplicate in
        # self-similar text (e.g. 'a'*11) and fakes a gap
        found = text.rfind(p, 0, pos + len(p))
        assert found != -1
        pos = max(pos, found + len(p))
    remainder = text[pos:]
    assert remainder.strip() == "", f"tail not covered: {remainder[:80]!r}"


@settings(max_examples=100, deadline=None)
@given(text=TEXT, size=SIZES)
def test_deterministic(text, size):
    assert recursive_split(text, size, size // 4) == recursive_split(
        text, size, size // 4
    )


@settings(max_examples=100, deadline=None)
@given(text=st.text(min_size=0, max_size=50), size=SIZES)
def test_short_text_identity(text, size):
    if 0 < len(text) <= size:
        assert recursive_split(text, size, 0) == [text]
    elif not text:
        assert recursive_split(text, size, 0) == []

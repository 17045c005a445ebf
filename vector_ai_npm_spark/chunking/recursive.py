"""A3 — recursive character sub-splitting (pure Python + Arrow-batched UDF).

Reference behavior (vector-client.ts:221-250 `handleChunk` +
:202-207 `getTextSplitter`): chunks whose content exceeds ``chunkSize``
(default 1000, :72) are re-split by langchain's
RecursiveCharacterTextSplitter with ``chunkOverlap`` (default 200, :73);
newlines in sub-chunks are replaced by spaces (:244); sub-chunks inherit
the parent's metadata *including chunkId* (:227-234 — NOT renumbered;
load-bearing for A9's context grouping, so preserved here).

The splitter below is a clean-room implementation of the public
langchain separator-ladder algorithm (separators ["\\n\\n", "\\n", " ",
""], keep_separator semantics, greedy merge with overlap carry-back).
Its guarantees — every piece ≤ chunk_size whenever the text is splittable
at the ladder's separators, consecutive pieces overlap ≤ chunk_overlap —
are what the tests pin; we do not chase langchain bug-for-bug.

Spark integration: a pandas_udf returning ARRAY<STRING> + posexplode.
Arrow moves each batch of contents across the Python boundary once
(~10-100× over row-at-a-time UDFs); the work is per-row independent, so
it scales linearly with executors and never shuffles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

DEFAULT_SEPARATORS: tuple[str, ...] = ("\n\n", "\n", " ", "")


def _split_on(text: str, sep: str) -> list[str]:
    """Split keeping the separator attached to the following piece
    (langchain keep_separator=True semantics)."""
    if sep == "":
        return list(text)
    parts = text.split(sep)
    out = [parts[0]] + [sep + p for p in parts[1:]]
    return [p for p in out if p != ""]


def _merge_splits(splits: list[str], chunk_size: int, chunk_overlap: int) -> list[str]:
    """Greedy merge of small pieces up to chunk_size, carrying back up to
    chunk_overlap characters of tail context into the next chunk."""
    docs: list[str] = []
    current: list[str] = []
    total = 0
    for s in splits:
        if total + len(s) > chunk_size and current:
            docs.append("".join(current))
            # drop from the front until the retained tail fits the overlap
            # budget AND the new piece fits the chunk budget
            while current and (
                total > chunk_overlap or (total + len(s) > chunk_size and total > 0)
            ):
                total -= len(current[0])
                current.pop(0)
        current.append(s)
        total += len(s)
    if current:
        docs.append("".join(current))
    return docs


def recursive_split(text: str, chunk_size: int = 1000, chunk_overlap: int = 200,
                    separators: tuple[str, ...] = DEFAULT_SEPARATORS) -> list[str]:
    """Pure function: text → list of pieces, each ≤ chunk_size when the
    active separator ladder can split that finely."""
    if len(text) <= chunk_size:
        return [text] if text else []
    # pick the first separator present in the text ('' always matches)
    sep = separators[-1]
    rest: tuple[str, ...] = ()
    for i, s in enumerate(separators):
        if s == "" or s in text:
            sep = s
            rest = separators[i + 1:]
            break
    final: list[str] = []
    small: list[str] = []
    for piece in _split_on(text, sep):
        if len(piece) <= chunk_size:
            small.append(piece)
            continue
        if small:
            final.extend(_merge_splits(small, chunk_size, chunk_overlap))
            small = []
        if rest:
            final.extend(recursive_split(piece, chunk_size, chunk_overlap, rest))
        else:
            final.append(piece)  # unsplittable run longer than chunk_size
    if small:
        final.extend(_merge_splits(small, chunk_size, chunk_overlap))
    return final


def subsplit_udf(chunk_size: int = 1000, chunk_overlap: int = 200) -> Column:
    """Factory for the Arrow-batched sub-split UDF.

    Returns a pandas_udf: content STRING → ARRAY<STRING> of sub-chunks
    with newlines flattened to spaces (vector-client.ts:244). Content at
    or under chunk_size passes through as a single-element array, exactly
    like handleChunk's fast path (:236-238).
    """

    @F.pandas_udf(ArrayType(StringType()))
    def _subsplit(contents: pd.Series) -> pd.Series:
        def one(text: str | None) -> list[str]:
            if text is None:
                return []
            if len(text) <= chunk_size:
                return [text]
            pieces = recursive_split(text, chunk_size, chunk_overlap)
            return [p.replace("\n", " ") for p in pieces]

        return contents.map(one)

    return _subsplit

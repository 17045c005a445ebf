"""A1/A2/A4 — MDX header chunking as DataFrame transforms.

Reference semantics (vector-client.ts:259-279 `preprocessMDX`):
  * split the document on the header regex ``/#{1,6} .+\\n/`` (``:260``) —
    NOT line-anchored; ``.`` excludes newline, so it equals
    ``#{1,6} [^\\n]+\\n``
  * sections alternate header/content; chunkId is 1-based (``:272``)
  * prevHeader/nextHeader: the reference indexes ``sections[i-1]`` (``:270``)
    which is the previous section's *content* — a bug. We implement the
    clearly-intended semantics (previous/next *header* via lag/lead) and
    document the deviation here.

Spark shape: JS ``String.split`` with a capturing group keeps the
separators; Spark/DuckDB split drops them, so we first mark each header
with a \\x01 sentinel (regexp_replace), split on the sentinel, and
posexplode. Piece 0 is the preamble before the first header (dropped, as
the reference's loop effectively does). One narrow projection + one
window over (doc_id) — a single shuffle, embarrassingly parallel at any
scale because documents never span rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEADER_RE = "(#{1,6} [^\n]+\n)"
SENTINEL = "\x01"

# --- synthetic MDX over the `documents` fixture -------------------------
# The fixture text is word salad without headers (FIXTURES.md §1), so the
# oracle-checked chunking queries synthesize a deterministic MDX document
# per row from fixture columns. Every ~7th doc gets a non-'## Context'
# first header to exercise A2 rejection. The same SQL fragment runs in
# Spark and DuckDB (both support ||, chr, substring, CASE).
SYNTH_MDX_SQL = (
    "CASE WHEN doc_id % 7 = 0 THEN '## Intro' ELSE '## Context' END"
    " || chr(10) || substring(text, 1, 100) || chr(10)"
    " || '## Details ' || lang || chr(10)"
    " || substring(text, 101, 150) || chr(10)"
    " || '### Notes ' || source || chr(10)"
    " || substring(text, 251)"
)


def synth_mdx(docs: DataFrame) -> DataFrame:
    """documents fixture → (doc_id, mdx) test corpus."""
    return docs.select("doc_id", F.expr(SYNTH_MDX_SQL).alias("mdx"))


def split_mdx_headers(mdx_df: DataFrame, text_col: str = "mdx",
                      id_col: str = "doc_id") -> DataFrame:
    """A1: (doc_id, mdx) → (doc_id, chunk_id, header, content,
    prev_header, next_header), chunk_id 1-based.
    """
    marked = F.regexp_replace(F.col(text_col), HEADER_RE, SENTINEL + "$1")
    pieces = F.split(marked, SENTINEL)
    exploded = (
        mdx_df.select(id_col, F.posexplode(pieces).alias("pos", "piece"))
        .where(F.col("pos") >= 1)  # pos 0 = preamble before first header
    )
    header = F.regexp_extract("piece", "^(#{1,6} [^\n]+)\n", 1)
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        exploded.select(
            id_col,
            F.col("pos").cast("long").alias("chunk_id"),  # 1-based (ref :272)
            header.alias("header"),
            F.expr("substring(piece, length(regexp_extract(piece, '^(#{1,6} [^\\n]+)\\n', 1)) + 2)")
            .alias("content"),
        )
        .withColumn("prev_header", F.lag("header").over(
            Window.partitionBy(id_col).orderBy("chunk_id")))
        .withColumn("next_header", F.lead("header").over(
            Window.partitionBy(id_col).orderBy("chunk_id")))
    )


def validate_context(chunks: DataFrame, id_col: str = "doc_id",
                     strict: bool = False) -> DataFrame:
    """A2: reference `validateContext` (vector-client.ts:161-170) throws
    unless the FIRST chunk's header starts with '## Context'. As a
    set-oriented operator this becomes a per-document validity flag;
    `strict=True` reproduces the throwing behavior.
    """
    flags = (
        chunks.where(F.col("chunk_id") == 1)
        .select(
            id_col,
            F.col("header").startswith("## Context").alias("is_valid_doc"),
        )
    )
    if strict:
        bad = flags.where(~F.col("is_valid_doc")).limit(1).collect()
        if bad:
            raise ValueError(
                f"Document {bad[0][0]} must start with '## Context' "
                "(vector-client.ts:165 semantics)"
            )
    return flags


def with_total_chunks(chunks: DataFrame, id_col: str = "doc_id") -> Column | DataFrame:
    """A4: stamp totalChunks (count of post-split chunks per document,
    vector-client.ts:179-195) on every chunk row. Window count — one
    shuffle on doc_id shared with A1's lag/lead."""
    w = Window.partitionBy(id_col)
    return chunks.withColumn("total_chunks", F.count(F.lit(1)).over(w).cast("long"))

"""Margin-based bitext mining (wave 9).

The CCMatrix/LASER construction (Artetxe & Schwenk 2019): to mine
translation pairs from two monolingual embedding pools, raw cosine is
NOT a reliable match score — hubness makes some vectors near everything.
The ratio margin fixes it by normalizing each pair score against the
average similarity of both endpoints' nearest-neighbor backgrounds:

    margin(x, y) = cos(x, y) / ((avgₖ(x) + avgₖ(y)) / 2)

with avgₖ(v) = mean of v's top-k cosines into the OPPOSITE pool.  A pair
scores high only when x and y are much closer to each other than either
is to its generic neighborhood — the score used to mine the billions of
pairs behind massively-multilingual MT corpora.

`mine_bitext_margin` splits the embeddings fixture into two pools by
label parity (the two-language stand-in), scores every cross-pool pair,
and emits each x-pool vector's best-margin match.

Plan shape: ONE pair frame (corpus ⋈ broadcast opposite pool at fixture
scale) feeds three windows — x-side top-k background, y-side top-k
background, and the final per-x argmax — never re-scoring pairs.  The
backgrounds aggregate through the exact-decimal fold (functions/numeric
dsum) so the k-term mean is order-independent and bit-stable
cross-engine; the margin ratio of two such doubles is then exact.

Scale design (100 TB): the fixture face is the exact quadratic pair
set; at production scale the IDENTICAL downstream plan (two background
windows + argmax) runs over an ANN-shortlist pair frame instead
(similarity_search_ann / IVF produce per-vector top-candidate lists that
provably contain the top-k background — the published pipelines mine
from FAISS shortlists the same way).  Candidate generation is
pluggable; margin scoring is this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.numeric import davg, o_davg
from vector_ai_npm_spark.functions.vectors import cosine_similarity, o_cosine
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_BG_K = 4   # background neighborhood size (top-k avg per endpoint)

# The exact all-pairs face is for shortlist-sized pools only (the
# dedup_embedding EXACT_MAX_ROWS precedent): past this pair budget the
# cross product stops being an operator and becomes an outage — the
# production path feeds margin_best_match an ANN shortlist frame
# (similarity_search_ann / IVF per-vector candidate lists) instead of
# x⋈y.  Refusing loudly beats silently attempting 625M-pair windows
# (measured: driver OOM at the 10× replica before this guard).
EXACT_MAX_PAIRS = 10_000_000


@query(
    "mine_bitext_margin",
    oracle=f"""
    WITH x AS (
      SELECT vec_id AS x_id, embedding AS x_emb FROM embeddings
      WHERE label % 2 = 0
    ), y AS (
      SELECT vec_id AS y_id, embedding AS y_emb FROM embeddings
      WHERE label % 2 = 1
    ), pairs AS MATERIALIZED (
      SELECT x_id, y_id, {o_cosine('x_emb', 'y_emb')} AS c
      FROM x CROSS JOIN y
    ), rx AS MATERIALIZED (
      SELECT x_id, y_id, c,
             ROW_NUMBER() OVER (PARTITION BY x_id
                                ORDER BY c DESC, y_id) AS rkx,
             ROW_NUMBER() OVER (PARTITION BY y_id
                                ORDER BY c DESC, x_id) AS rky
      FROM pairs
    ), bgx AS (
      SELECT x_id, {o_davg('c')} AS bx FROM rx
      WHERE rkx <= {_BG_K} GROUP BY x_id
    ), bgy AS (
      SELECT y_id, {o_davg('c')} AS by_ FROM rx
      WHERE rky <= {_BG_K} GROUP BY y_id
    ), scored AS (
      SELECT p.x_id, p.y_id,
             p.c / ((bgx.bx + bgy.by_) / 2.0) AS margin
      FROM rx p
      JOIN bgx ON p.x_id = bgx.x_id
      JOIN bgy ON p.y_id = bgy.y_id
    )
    SELECT x_id, y_id, margin FROM (
      SELECT x_id, y_id, margin,
             ROW_NUMBER() OVER (PARTITION BY x_id
                                ORDER BY margin DESC, y_id) AS rk
      FROM scored
    ) WHERE rk = 1
    """,
)
def mine_bitext_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best ratio-margin cross-pool match per x-pool vector — see module
    docstring for the margin definition and the shortlist scale path."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.where(F.col("label") % 2 == 0).select(
        F.col("vec_id").alias("x_id"), F.col("embedding").alias("x_emb")
    )
    y = emb.where(F.col("label") % 2 == 1).select(
        F.col("vec_id").alias("y_id"), F.col("embedding").alias("y_emb")
    )
    return margin_best_match(x, y)


def margin_best_match(x: DataFrame, y: DataFrame) -> DataFrame:
    """(x_id, y_id, margin): each x's best cross-pool match by ratio
    margin.  ``x``: (x_id, x_emb); ``y``: (y_id, y_emb).

    Exact all-pairs face — guarded by EXACT_MAX_PAIRS; see module
    docstring for the ANN-shortlist scale path that replaces the cross
    product while keeping this exact downstream plan."""
    n_pairs = x.count() * y.count()
    if n_pairs > EXACT_MAX_PAIRS:
        raise ValueError(
            f"margin_best_match exact face refused: {n_pairs} pairs > "
            f"EXACT_MAX_PAIRS={EXACT_MAX_PAIRS}; feed an ANN-shortlist "
            "pair frame instead (see retrieval.bitext module docstring)"
        )
    pairs = x.join(F.broadcast(y)).select(
        "x_id",
        "y_id",
        cosine_similarity(F.col("x_emb"), F.col("y_emb")).alias("c"),
    )
    # the scored candidate frame feeds THREE consumers (both background
    # aggregates + the final join); checkpointing it once keeps the
    # cosine scoring to a single pass — at production scale this frame
    # is the ANN shortlist (k·n rows), not the full cross product
    ranked = pairs.select(
        "x_id",
        "y_id",
        "c",
        F.row_number()
        .over(Window.partitionBy("x_id").orderBy(F.desc("c"), F.asc("y_id")))
        .alias("rkx"),
        F.row_number()
        .over(Window.partitionBy("y_id").orderBy(F.desc("c"), F.asc("x_id")))
        .alias("rky"),
    ).localCheckpoint(eager=True)
    bgx = (
        ranked.where(F.col("rkx") <= _BG_K)
        .groupBy("x_id")
        .agg(davg("c", "bx"))
    )
    bgy = (
        ranked.where(F.col("rky") <= _BG_K)
        .groupBy("y_id")
        .agg(davg("c", "by_"))
    )
    scored = (
        ranked.join(bgx, "x_id")
        .join(bgy, "y_id")
        .select(
            "x_id",
            "y_id",
            (F.col("c") / ((F.col("bx") + F.col("by_")) / F.lit(2.0)))
            .alias("margin"),
        )
    )
    best = F.row_number().over(
        Window.partitionBy("x_id").orderBy(F.desc("margin"), F.asc("y_id"))
    )
    return (
        scored.withColumn("rk", best)
        .where(F.col("rk") == 1)
        .select("x_id", "y_id", "margin")
    )

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

import numpy as np
import pandas as pd
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

# The exact FACE bounds each pool to a deterministic md5-sampled cap so
# its pair frame stays under EXACT_MAX_PAIRS at ANY corpus size (r12:
# the r11 sf1 sweep hit the guard's refusal at 99.99M pairs — correct
# but a dead face; the cap keeps the exact-oracle face alive at every
# scale).  3000² = 9M < the 10M guard; a no-op at sf0.01/0.1 (pools
# ≤ 1000), binding at sf1+.  The SAME cap is in the oracle SQL, so both
# engines mine the identical sub-pool.  Unbounded-scale mining is the
# ANN face (`mine_bitext_margin_ann`) — candidate generation is the
# pluggable part, per the module docstring.
_EXACT_POOL_CAP = 3000


@query(
    "mine_bitext_margin",
    oracle=f"""
    WITH x_all AS (
      SELECT vec_id AS x_id, embedding AS x_emb FROM embeddings
      WHERE label % 2 = 0
    ), x AS (
      SELECT x_id, x_emb FROM x_all
      ORDER BY md5(CAST(x_id AS VARCHAR)), x_id LIMIT {_EXACT_POOL_CAP}
    ), y_all AS (
      SELECT vec_id AS y_id, embedding AS y_emb FROM embeddings
      WHERE label % 2 = 1
    ), y AS (
      SELECT y_id, y_emb FROM y_all
      ORDER BY md5(CAST(y_id AS VARCHAR)), y_id LIMIT {_EXACT_POOL_CAP}
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
    docstring for the margin definition and the shortlist scale path.
    Each pool is bounded to the deterministic md5-top-`_EXACT_POOL_CAP`
    subset (mirrored in the oracle SQL) so the exact face never crosses
    the EXACT_MAX_PAIRS guard — a no-op below sf1."""
    emb = load_table(spark, sf_dir, "embeddings")

    def _cap(df: DataFrame, id_col: str) -> DataFrame:
        return df.orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        ).limit(_EXACT_POOL_CAP)

    x = _cap(
        emb.where(F.col("label") % 2 == 0).select(
            F.col("vec_id").alias("x_id"), F.col("embedding").alias("x_emb")
        ),
        "x_id",
    )
    y = _cap(
        emb.where(F.col("label") % 2 == 1).select(
            F.col("vec_id").alias("y_id"), F.col("embedding").alias("y_emb")
        ),
        "y_id",
    )
    return margin_best_match(x, y)


def margin_best_match(x: DataFrame, y: DataFrame) -> DataFrame:
    """(x_id, y_id, margin): each x's best cross-pool match by ratio
    margin.  ``x``: (x_id, x_emb); ``y``: (y_id, y_emb).

    Exact all-pairs face — guarded by EXACT_MAX_PAIRS; the ANN-shortlist
    scale path (:func:`ann_shortlist_pairs` → :func:`margin_from_pairs`)
    replaces the cross product while keeping this exact downstream
    plan."""
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
    return margin_from_pairs(pairs)


def margin_from_pairs(pairs: DataFrame) -> DataFrame:
    """The margin-scoring plan over ANY scored candidate frame
    (x_id, y_id, c): top-k backgrounds per endpoint, ratio margin, per-x
    argmax.  The exact face feeds it the full cross product; the
    production face feeds it an ANN shortlist — identical plan either
    way, which is what makes the shortlist swap a candidate-generation
    decision rather than a semantics change."""
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


# ---------------------------------------------------------------------------
# ANN-shortlist scale path (round 7): sign-LSH candidates, same margin plan
# ---------------------------------------------------------------------------

_SHORTLIST_K = 8  # per-x candidates kept; must be >= _BG_K


def ann_shortlist_pairs(
    x: DataFrame, y: DataFrame,
    n_tables: int = 8, bits: int | None = None, seed: int = 42,
    shortlist_k: int = _SHORTLIST_K,
) -> DataFrame:
    """(x_id, y_id, c): per-x top-``shortlist_k`` cross-pool candidates
    from a sign-LSH band join — the FAISS-shortlist stand-in the
    published mining pipelines feed the margin scorer (module
    docstring).  Construction:

      * both pools get ``n_tables`` signatures of ``bits`` sign bits
        each (dedup/embedding_router.sign_lsh_signatures — seeded, so
        fixed data ⇒ fixed candidates, which keeps downstream faces
        oracle-checkable);
      * the band join is NARROW (ids + signature only; embeddings
        re-join afterwards) and an equi-join on (table, sig) — never a
        cross product;
      * candidates trim to each x's top-k by cosine (one partitioned
        window over the candidate frame).  Backgrounds and argmax then
        run `margin_from_pairs` over this frame, which is the
        documented shortlist semantics: avg_k over the mined top-k
        lists, argmax over the shortlist.

    Scale: candidate count is O(n·E[bucket load]) — the embedding_router
    sizing discipline; per-x output is exactly ``shortlist_k`` rows, so
    the margin stage is k·n however large the pools are.

    ``bits`` defaults to the corpus-scaled derivation (r12 sf10 catch:
    fixed bits=10 left bucket occupancy growing linearly — ~390 rows
    per bucket per table at a 400k pool, a 6e8-pair candidate frame
    that OOM'd the executor; target occupancy ~20 keeps candidates
    O(n·tables)).  Base stays 10 at pools ≤ 20k, so sf0.01/0.1/sf1
    behavior is unchanged."""
    if bits is None:
        import math

        n_pool = max(x.count(), y.count())
        bits = min(20, max(10, math.ceil(math.log2(max(n_pool, 2) / 20.0))))
    sig = _lazy_sign_lsh(n_tables=n_tables, bits=bits, seed=seed)
    xb = x.select(
        "x_id", F.posexplode(sig(F.col("x_emb"))).alias("tbl", "sig")
    )
    yb = y.select(
        "y_id", F.posexplode(sig(F.col("y_emb"))).alias("tbl", "sig")
    )
    cand = (
        xb.join(yb, ["tbl", "sig"])
        .select("x_id", "y_id")
        .dropDuplicates(["x_id", "y_id"])
    )
    scored = (
        cand.join(x, "x_id")
        .join(y, "y_id")
        .select(
            "x_id",
            "y_id",
            cosine_similarity(F.col("x_emb"), F.col("y_emb")).alias("c"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("x_id").orderBy(F.desc("c"), F.asc("y_id"))
    )
    return (
        scored.withColumn("rk", rk)
        .where(F.col("rk") <= shortlist_k)
        .drop("rk")
    )


def _lazy_sign_lsh(n_tables: int, bits: int, seed: int):
    """sign_lsh_signatures without the up-front dim probe: the seeded
    hyperplanes are derived INSIDE the UDF from the first batch's
    vector length (same RandomState(seed) ⇒ identical planes on every
    executor and batch), so no collect job runs just to learn `dim`
    and an empty pool simply yields no rows (round-7 review fix)."""
    from pyspark.sql.pandas.functions import pandas_udf

    weights = 1 << np.arange(bits, dtype=np.int64)
    state: dict[str, np.ndarray] = {}

    @pandas_udf("array<long>")
    def lsh_sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (n, dim)
        planes = state.get("planes")
        if planes is None or planes.shape[1] != mat.shape[1]:
            planes = np.random.RandomState(seed).normal(
                size=(n_tables * bits, mat.shape[1])
            )
            state["planes"] = planes
        signs = (mat @ planes.T) > 0
        sigs = (signs.reshape(len(mat), n_tables, bits) * weights).sum(axis=2)
        return pd.Series(list(sigs))

    return lsh_sig


_PLANT_OFFSET = 1_000_000

# r12 (sf10): the contract's ORACLE is the exact cross-pair margin SQL,
# which is 2e10 pairs at sf10's 100k/200k pools — infeasible for any
# single-node oracle.  The CONTRACT corpus (x-pool + decoys, twins
# derived from x) is therefore bounded to the deterministic md5-top-N
# of each base pool, mirrored Spark/SQL: a no-op at sf0.01/0.1 (pools
# 250/1000), binding at sf1+ (6k × 12k = 7.2e7 oracle pairs).  The
# shortlist MACHINERY under test is unchanged and corpus-scaled
# (ann_shortlist_pairs derives bits from pool size).
_ANN_CONTRACT_POOL_CAP = 6000


def _o_capped_pool(label_pred: str) -> str:
    return f"""(
      SELECT vec_id, embedding FROM embeddings WHERE {label_pred}
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
      LIMIT {_ANN_CONTRACT_POOL_CAP})"""


@query(
    "mine_bitext_margin_ann",
    oracle=f"""
    WITH x AS (
      SELECT vec_id AS x_id,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x_emb
      FROM {_o_capped_pool('label % 2 = 0')}
    ), y AS (
      SELECT vec_id AS y_id,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS y_emb
      FROM {_o_capped_pool('label % 2 = 1')}
      UNION ALL
      SELECT vec_id + {_PLANT_OFFSET} AS y_id,
             list_prepend(CAST(embedding[1] AS DOUBLE) + CAST(0.001 AS DOUBLE),
                          CAST(embedding[2:len(embedding)] AS DOUBLE[]))
               AS y_emb
      FROM {_o_capped_pool('label % 2 = 0')}
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
    SELECT x_id, y_id,
           (y_id = x_id + {_PLANT_OFFSET}) AS is_planted_twin
    FROM (
      SELECT x_id, y_id, margin,
             ROW_NUMBER() OVER (PARTITION BY x_id
                                ORDER BY margin DESC, y_id) AS rk
      FROM scored
    ) WHERE rk = 1
    """,
)
def mine_bitext_margin_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION bitext face: sign-LSH shortlist → margin argmax,
    oracle-checked for MATCH IDENTITY against the exact all-pairs margin
    SQL on a planted corpus (x = even-label pool; y = odd-label decoys
    plus a near-identical twin per x at cosine ≈ 0.9999).

    Soundness (the dedup_embedding_ann argument): the planted gap makes
    the margin argmax land on the twin under BOTH candidate policies —
    exact margins (oracle) and shortlist margins (this face) disagree
    on VALUES (backgrounds average different k-sets), but cannot
    disagree on the winner when the twin's cosine clears every decoy by
    >0.15 — so the emitted (x_id, y_id, is_planted_twin) rows
    hash-match, and the face simultaneously proves shortlist recall
    (a twin missed by the LSH bands would surface as a non-twin row on
    both sides failing the hash).  Margin VALUES are pinned by the
    exact face `mine_bitext_margin`.  (On the UNPLANTED fixture the
    two faces agree only on true matches — random cross-pool cosines
    are near-tied noise, so argmax identity there is meaningless by
    construction; measured 3.7% noise-pair agreement, 100% planted-pair
    agreement.  Mining pipelines only consume high-margin pairs, which
    is exactly the planted regime this oracle pins.)"""
    emb = load_table(spark, sf_dir, "embeddings")

    def _pool(parity: int) -> DataFrame:
        return (
            emb.where(F.col("label") % 2 == parity)
            .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
            .limit(_ANN_CONTRACT_POOL_CAP)
        )

    arr = F.col("embedding").cast("array<double>")
    x = _pool(0).select(F.col("vec_id").alias("x_id"), arr.alias("x_emb"))
    decoys = _pool(1).select(
        F.col("vec_id").alias("y_id"), arr.alias("y_emb")
    )
    twins = _pool(0).select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("y_id"),
        F.expr(
            "concat(array(cast(embedding[0] as double) + 0.001d), "
            "slice(cast(embedding as array<double>), 2, "
            "size(embedding) - 1))"
        ).alias("y_emb"),
    )
    y = decoys.unionByName(twins)
    pairs = ann_shortlist_pairs(x, y)
    return margin_from_pairs(pairs).select(
        "x_id",
        "y_id",
        (F.col("y_id") == F.col("x_id") + F.lit(_PLANT_OFFSET)).alias(
            "is_planted_twin"
        ),
    )

"""Embedding near-dup pairs: threshold-adaptive route (exact ⇄ LSH).

The 100 TB decision tree for "find all pairs with cosine ≥ t":

  t ≥ ~0.7 (real near-dup territory)  → LSH prune + exact re-rank.
      On unit-norm vectors cosine ≥ t ⟺ euclidean d ≤ √(2−2t); at
      t=0.95 that is d ≤ 0.316 while unrelated pairs sit near √2 — a
      4.5× distance gap that BucketedRandomProjectionLSH converts into
      bucket-equi-join candidates (no cross product, shuffle on bucket
      id). Measured on the fixture with planted dups: recall 1.0, zero
      false candidates surviving the exact re-rank.

  t < ~0.7 on near-orthogonal data     → exact blocked grid join.
      Here the true-pair/random-pair distance ratio collapses (t=0.4 ⇒
      1.10 vs 1.41), so ANY sub-quadratic candidate scheme must either
      drop true pairs (recall < 1 — wrong answers) or emit nearly all
      pairs (no pruning + LSH overhead). Low-threshold all-pairs is
      intrinsically O(n²): the honest plan is the salted grid join that
      at least parallelizes perfectly. At scale you don't run t=0.4
      dedup on 100 TB — you run t≥0.9; the router encodes that.

Reference context: the reference's similarity machinery is a pgvector
`ORDER BY embedding <=> $1 LIMIT k` (vector-client.ts:402-404); a
corpus-wide near-dup pair join has no reference counterpart and follows
the published MinHash/LSH dedup playbook instead.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.vectors import cosine_similarity

# Below this threshold LSH pruning is unsound on near-orthogonal data
# (see module docstring); route exact.
LSH_MIN_THRESHOLD = 0.7

# Above this corpus size the exact O(n²/block) grid join is never the
# right answer no matter the threshold — auto-route refuses it.
EXACT_MAX_ROWS = 100_000


def exact_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    salt: int = 4,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold within blocks: exact-dup
    collapse → salted grid join on the canonical representatives →
    pair re-expansion.

    A plain self-join on `block_col` shuffles on ~#blocks keys ⇒ at most
    #blocks busy tasks no matter the cluster. The grid rewrite salts both
    sides (salt = id % S) and joins on (block, salt_a, salt_b): each of
    the S² cells per block is an independent shuffle key, restoring full
    parallelism at an S× replication of the (narrow) inputs. Every
    unordered pair lands in exactly one cell ⇒ identical results to the
    naive join.

    The collapse (same discipline as lsh_pairs) shrinks the quadratic
    term to DISTINCT vectors: B exact copies cost one grid row instead
    of B, and the C(B,2) duplicate pairs are emitted by the linear
    re-expansion instead of B² cosine evaluations. On a duplicate-heavy
    corpus this converts the O(n²/block) grid into O(d²/block) for d
    distinct values (BASELINE.md §4d: the 10× replica, which is 10
    copies of everything, runs the grid at ~1× cost). Identical inputs
    ⇒ identical cosines, so results are bit-equal to the uncollapsed
    plan (the hash-green dedup_embedding oracle is unchanged).
    """
    from pyspark.storagelevel import StorageLevel

    reps, members = collapse_exact_duplicates(emb, id_col, vec_col, block_col)
    reps = reps.persist(StorageLevel.MEMORY_AND_DISK)
    members = members.persist(StorageLevel.MEMORY_AND_DISK)
    class_cols = ["_h1", "_h2"] + ([block_col] if block_col else [])

    cols = [id_col, vec_col] + ([block_col] if block_col else [])
    base = reps.select(*cols, (F.col(id_col) % salt).alias("_salt"))
    grid = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_other")
    a = base.select("*", grid).alias("a")
    b = base.select("*", grid).alias("b")
    cond = (
        (F.col("a._other") == F.col("b._salt"))
        & (F.col("b._other") == F.col("a._salt"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    )
    if block_col:
        cond = (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")) & cond
    cos = cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    rep_pairs = (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias(f"{id_col}_a"),
            F.col(f"b.{id_col}").alias(f"{id_col}_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
    return expand_member_pairs(
        rep_pairs, reps, members, threshold, id_col, vec_col, class_cols
    )


def sign_lsh_signatures(
    dim: int, n_tables: int = 8, bits: int = 12, seed: int = 42
):
    """Arrow-vectorized random-hyperplane (sign) LSH signatures.

    One signature per table: ``bits`` sign bits of gaussian projections
    packed into a long. AND-amplification within a table (all `bits`
    must match) × OR-amplification across ``n_tables`` — the standard
    cosine-LSH construction Spark's BucketedRandomProjectionLSH LACKS
    (one projection per table, OR-only): on unit-norm data BRP's single
    projection has std ≈ 1/√dim, so most rows share a handful of buckets
    and the bucket self-join degenerates toward all-pairs (measured:
    8.5× time at 10× rows). Sign-LSH collision odds: P(bit) = 1 − θ/π ⇒
    a cos 0.9995 planted dup collides per-table at .99¹² ≈ 0.89, missing
    all 8 tables with p ≈ 3·10⁻⁸, while a random pair (cos≈0) survives a
    table at 2⁻¹² — candidates stay O(n + true pairs).

    Deterministic: hyperplanes from a seeded RandomState; fixed data ⇒
    fixed signatures ⇒ fixed candidate set (what lets the ANN query stay
    oracle-checkable).
    """
    from pyspark.sql.pandas.functions import pandas_udf

    planes = np.random.RandomState(seed).normal(size=(n_tables * bits, dim))
    weights = 1 << np.arange(bits, dtype=np.int64)

    @pandas_udf("array<long>")
    def lsh_sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (n, dim)
        signs = (mat @ planes.T) > 0  # (n, n_tables*bits)
        sigs = (signs.reshape(len(mat), n_tables, bits) * weights).sum(axis=2)
        return pd.Series(list(sigs))

    return lsh_sig


def collapse_exact_duplicates(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> tuple[DataFrame, DataFrame]:
    """(reps, members): one canonical row per distinct vector value.

    Class key = 2×xxhash64 of the vector array (128 effective bits —
    collision odds negligible below ~10¹⁸ rows) plus the block column,
    so identical vectors in different blocks stay separate, matching the
    band join's block predicate.  ``reps`` carries the minimum id, one
    copy of the vector, and the class size; ``members`` is the narrow
    (class key, id) mapping used to re-expand representative pairs into
    member pairs.  One linear hash-groupBy — the same discipline as
    dedup_exact on text."""
    arr = F.col(vec_col).cast("array<double>")
    keyed = emb.select(
        F.col(id_col),
        arr.alias(vec_col),
        *([block_col] if block_col else []),
        F.xxhash64(arr).alias("_h1"),
        F.xxhash64(F.lit(1), arr).alias("_h2"),
    )
    class_cols = ["_h1", "_h2"] + ([block_col] if block_col else [])
    reps = keyed.groupBy(*class_cols).agg(
        F.min(id_col).alias(id_col),
        F.min_by(vec_col, F.col(id_col)).alias(vec_col),
        F.count(F.lit(1)).alias("_csize"),
    )
    members = keyed.select(*class_cols, id_col)
    return reps, members


def lsh_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    n_tables: int = 8,
    bits: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """LSH-pruned pairs: exact-dup collapse → sign-LSH band join on the
    canonical representatives → exact re-rank → pair re-expansion.

    Shape (the same banded-equi-join discipline as dedup_minhash_pairs):
    explode each row to (table, signature), shuffle-join on the compound
    band key — never a cross product — then dropDuplicates the pair ids
    and filter by TRUE cosine. The re-rank removes every false positive,
    so precision is always 1.0; only recall depends on (bits, n_tables),
    and it rises toward 1 as similarity → 1 (≥0.9 at the 0.95 boundary
    with the defaults; ≈1−3·10⁻⁸ for genuine near-dups at cos ≥ 0.999).

    Three disciplines that make this hold at 100 TB:

    * **Exact duplicates are collapsed BEFORE banding.** B identical
      vectors share every bucket, so banding raw rows emits B² band
      candidates per duplicate class — the dominant cost on real web
      corpora where exact duplication is heavy. A linear hash-groupBy
      (collapse_exact_duplicates) keeps one representative per distinct
      vector; the band join sees each value once, and member pairs are
      re-expanded AFTER the re-rank, so the B² term moves from the
      candidate stage (wasted work) to the output (true pairs — already
      output-bound). Identical inputs ⇒ identical cosines, so results
      are bit-equal to the uncollapsed plan (pinned in tests).
    * **The band join is NARROW.** Only (id, block, table, sig) enters
      the self-join; vectors are equi-joined back by id AFTER the pair
      dedup, so a hash collision costs ~24 bytes of shuffle, not two
      full embedding payloads (~1 KB at dim 64, ~12 KB at dim 1536).
    * **Bits scale with n.** Expected random candidates per table are
      n²/2^bits — QUADRATIC for fixed bits. `bits = log2(n/10)`
      (clamped to [12, 20], n = #distinct vectors) keeps expected random
      collisions ≈ 5n per table, i.e. the candidate set stays
      O(n + true pairs) at any corpus size. The recall cost is only at
      the threshold boundary: a cos 0.9995 near-dup still misses all 8
      tables with p < 2·10⁻⁶ even at bits=20 (P(bit)=1−θ/π=0.99;
      0.99²⁰≈0.82 per table).
    """
    from pyspark.storagelevel import StorageLevel

    reps, members = collapse_exact_duplicates(emb, id_col, vec_col, block_col)
    # reps feeds ≥5 consumers (stats, both band sides, both re-join
    # sides, the class map, the intra-class cosine); members feeds 4.
    reps = reps.persist(StorageLevel.MEMORY_AND_DISK)
    members = members.persist(StorageLevel.MEMORY_AND_DISK)
    class_cols = ["_h1", "_h2"] + ([block_col] if block_col else [])

    stats = reps.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size(F.col(vec_col))).alias("d"),
    ).collect()[0]
    n, dim = stats["n"] or 0, stats["d"] or 64
    if bits is None:
        bits = min(20, max(12, math.ceil(math.log2(max(n, 2) / 10.0))))
    sig_udf = sign_lsh_signatures(dim, n_tables, bits, seed)
    key_cols = [id_col] + ([block_col] if block_col else [])
    bands = reps.select(
        *key_cols,
        F.posexplode(sig_udf(F.col(vec_col)))
        .alias("lsh_table", "lsh_sig"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cond = (
        (F.col("a.lsh_table") == F.col("b.lsh_table"))
        & (F.col("a.lsh_sig") == F.col("b.lsh_sig"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    )
    if block_col:
        cond = (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")) & cond
    cand = (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias(f"{id_col}_a"),
            F.col(f"b.{id_col}").alias(f"{id_col}_b"),
        )
        .dropDuplicates([f"{id_col}_a", f"{id_col}_b"])
    )
    vecs = reps.select(F.col(id_col), F.col(vec_col).alias("_v"))
    cand = cand.join(
        vecs.select(F.col(id_col).alias(f"{id_col}_a"), F.col("_v").alias("_va")),
        f"{id_col}_a",
    ).join(
        vecs.select(F.col(id_col).alias(f"{id_col}_b"), F.col("_v").alias("_vb")),
        f"{id_col}_b",
    )
    cos = cosine_similarity(F.col("_va"), F.col("_vb"))
    rep_pairs = (
        cand.select(f"{id_col}_a", f"{id_col}_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )

    return expand_member_pairs(
        rep_pairs, reps, members, threshold, id_col, vec_col, class_cols
    )


def expand_member_pairs(
    rep_pairs: DataFrame,
    reps: DataFrame,
    members: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    class_cols: list[str],
) -> DataFrame:
    """Representative pairs → member pairs (shared by exact_pairs and
    lsh_pairs after the exact-dup collapse).

    Cross-class: every member of class(rep_a) pairs with every member
    of class(rep_b); identical vectors ⇒ the rep cosine IS the member
    cosine. Orientation by least/greatest (classes are disjoint id
    sets, so no pair is emitted twice).

    Intra-class: each duplicate class of size B contributes its C(B,2)
    pairs at the self-cosine of the shared vector (≈1.0 up to fp
    rounding — computed, not assumed, so the emitted value is
    bit-identical to the uncollapsed plan's).
    """
    rep_class = reps.select(
        F.col(id_col).alias("_rep_id"),
        *[F.col(c).alias(f"_k_{c}") for c in class_cols],
    )

    def _members_as(side: str):
        cond = None
        for c in class_cols:
            eq = F.col(f"{side}._k_{c}") == F.col(f"m_{side}.{c}")
            cond = eq if cond is None else (cond & eq)
        return cond

    xp = (
        rep_pairs.join(
            rep_class.alias("ca"),
            F.col(f"{id_col}_a") == F.col("ca._rep_id"),
        )
        .join(
            rep_class.alias("cb"),
            F.col(f"{id_col}_b") == F.col("cb._rep_id"),
        )
    )
    ma, mb = members.alias("m_ca"), members.alias("m_cb")
    cross = (
        xp.join(ma, _members_as("ca"))
        .join(mb, _members_as("cb"))
        .select(
            F.least(F.col(f"m_ca.{id_col}"), F.col(f"m_cb.{id_col}")).alias(
                f"{id_col}_a"
            ),
            F.greatest(F.col(f"m_ca.{id_col}"), F.col(f"m_cb.{id_col}")).alias(
                f"{id_col}_b"
            ),
            "cosine",
        )
    )
    dup_classes = reps.where(F.col("_csize") >= 2).select(
        *class_cols,
        cosine_similarity(F.col(vec_col), F.col(vec_col)).alias("cosine"),
    )
    ia, ib = members.alias("ia"), members.alias("ib")
    intra_cond = F.col(f"ia.{id_col}") < F.col(f"ib.{id_col}")
    for c in class_cols:
        intra_cond = (F.col(f"ia.{c}") == F.col(f"ib.{c}")) & intra_cond
    intra_pairs = ia.join(ib, intra_cond).select(
        *[F.col(f"ia.{c}") for c in class_cols],
        F.col(f"ia.{id_col}").alias(f"{id_col}_a"),
        F.col(f"ib.{id_col}").alias(f"{id_col}_b"),
    )
    intra = (
        intra_pairs.join(dup_classes, class_cols)
        .where(F.col("cosine") >= threshold)
        .select(f"{id_col}_a", f"{id_col}_b", "cosine")
    )
    return cross.unionByName(intra)


def choose_mode(threshold: float, n_rows: int) -> str:
    """The auto-routing decision table (pure, pinned in tests):

    | threshold    | n ≤ EXACT_MAX_ROWS | n > EXACT_MAX_ROWS |
    |--------------|--------------------|--------------------|
    | ≥ 0.7        | lsh                | lsh                |
    | < 0.7        | exact              | lsh                |

    Low-threshold LSH on near-orthogonal data loses recall (module
    docstring), but above EXACT_MAX_ROWS the O(n²/block) grid join is a
    cluster-killer regardless — a recall-lossy sub-quadratic answer
    beats a job that never finishes, so the size cap wins the conflict
    and the caller who truly wants exact all-pairs at scale must say
    mode="exact" explicitly."""
    if threshold >= LSH_MIN_THRESHOLD or n_rows > EXACT_MAX_ROWS:
        return "lsh"
    return "exact"


def embedding_dedup_pairs(
    emb: DataFrame,
    threshold: float,
    mode: str = "auto",
    **kwargs,
) -> DataFrame:
    """Route by threshold AND corpus size: LSH prune when sound
    (t ≥ 0.7) or whenever the corpus exceeds EXACT_MAX_ROWS (the
    O(n²/block) exact face must be unreachable at scale by default).

    mode: "auto" (default), "lsh", or "exact".
    """
    if mode == "auto":
        mode = choose_mode(threshold, emb.count())
    if mode == "lsh":
        return lsh_pairs(emb, threshold, **kwargs)
    if mode == "exact":
        return exact_pairs(emb, threshold, **kwargs)
    raise ValueError(f"unknown mode {mode!r} (auto|lsh|exact)")

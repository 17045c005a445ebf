"""Deduplication suite (SURVEY §2B B17/B18 + north-star variants).

Five dedup strategies, each a first-class operator over `documents` /
`embeddings`, ordered by cost-at-scale:

  dedup_exact            content hash          O(n) + tiny shuffle
  dedup_simhash          16-bit signed profile O(n·tokens), pairs via equality
  dedup_minhash_*        MinHash signatures + banded LSH candidate pairs
  dedup_ngram_jaccard    exact Jaccard within blocking keys
  dedup_embedding        cosine near-dup within label blocks
  dedup_near_lsh         MLlib MinHashLSH (the 100 TB approx path)

Hash discipline for oracle parity: md5 is the cross-engine hash (Spark
``md5`` == DuckDB ``md5``); 15 hex chars → BIGINT via Spark ``conv(...,
16, 10)`` / DuckDB ``CAST('0x…' AS BIGINT)`` (both < 2^60, no sign
issues). Spark's xxhash64 would be faster JVM-side but has no DuckDB
counterpart — at production scale swap `_H` for xxhash64 freely (values
change, semantics don't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.vectors import cosine_similarity, o_cosine
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

N_MINHASH = 8
N_BANDS = 4  # bands of 2 → candidates need 2 consecutive matching hashes

# --- shared token/shingle fragments (kept textually parallel per engine) --

_SPARK_TOKS = "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
_DUCK_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"

_SPARK_SHINGLES = (
    f"CASE WHEN size({_SPARK_TOKS}) >= 3 THEN array_distinct(transform("
    f"sequence(1, size({_SPARK_TOKS}) - 2), "
    f"i -> array_join(slice({_SPARK_TOKS}, i, 3), ' '))) "
    f"ELSE array(array_join({_SPARK_TOKS}, ' ')) END"
)
_DUCK_SHINGLES = (
    f"CASE WHEN len({_DUCK_TOKS}) >= 3 THEN list_distinct(list_transform("
    f"range(1, len({_DUCK_TOKS}) - 1), "
    f"i -> array_to_string({_DUCK_TOKS}[i:i+2], ' '))) "
    f"ELSE [array_to_string({_DUCK_TOKS}, ' ')] END"
)


def _spark_minhash(i: int) -> str:
    return (
        "array_min(transform(shingles, "
        f"s -> cast(conv(substring(md5(concat(s, '#{i}')), 1, 15), 16, 10) as bigint)))"
    )


def _duck_minhash(i: int) -> str:
    return (
        "list_min(list_transform(shingles, "
        f"s -> CAST('0x' || substring(md5(s || '#{i}'), 1, 15) AS BIGINT)))"
    )


# --------------------------------------------------------------------------
# B17 — exact dedup by content hash
# --------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    SELECT doc_id,
           md5(text) AS content_hash,
           CAST(MIN(doc_id) OVER (PARTITION BY md5(text)) AS BIGINT) AS keeper_id,
           (doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text))) AS is_dup
    FROM documents
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17: hash-groupBy exact dedup — every doc labeled keep/dup with its
    keeper (min doc_id per hash). At 100 TB: one shuffle on the 128-bit
    hash; the window count per key is O(dup-group size)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("text"))
    w = Window.partitionBy(h)
    keeper = F.min("doc_id").over(w)
    return docs.select(
        "doc_id",
        h.alias("content_hash"),
        keeper.cast("long").alias("keeper_id"),
        (F.col("doc_id") != keeper).alias("is_dup"),
    )


# --------------------------------------------------------------------------
# B18a — exact n-gram Jaccard within blocking keys
# --------------------------------------------------------------------------


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang, source, {_DUCK_SHINGLES} AS shingles
      FROM documents
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
           len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
          len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18a: exact 3-gram Jaccard near-dup pairs, blocked by
    (lang, source) so the self-join is quadratic only within blocks —
    the classic blocking pattern that keeps exact Jaccard feasible when
    a corpus is groupable; the un-blockable case is dedup_near_lsh."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", "lang", "source", F.expr(_SPARK_SHINGLES).alias("shingles")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.array_union(F.col("a.shingles"), F.col("b.shingles")))
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.8)
    )


# --------------------------------------------------------------------------
# B18b — MinHash signatures + banded LSH candidate pairs (pure SQL/exprs)
# --------------------------------------------------------------------------


@query(
    "dedup_minhash_signature",
    oracle="WITH sh AS (SELECT doc_id, " + _DUCK_SHINGLES + """ AS shingles
      FROM documents)
    SELECT doc_id, """
    + ", ".join(f"{_duck_minhash(i)} AS mh{i}" for i in range(N_MINHASH))
    + " FROM sh",
)
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18b-1: 8-hash MinHash signature per document, entirely JVM-side
    (md5 + array fold per hash — no UDF, no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.expr(_SPARK_SHINGLES).alias("shingles"))
    return sh.select(
        "doc_id",
        *[F.expr(_spark_minhash(i)).alias(f"mh{i}") for i in range(N_MINHASH)],
    )


_BAND_KEYS_SPARK = [
    f"md5(concat(cast(mh{2*b} as string), ',', cast(mh{2*b+1} as string)))"
    for b in range(N_BANDS)
]
_BAND_KEYS_DUCK = [
    f"md5(CAST(mh{2*b} AS VARCHAR) || ',' || CAST(mh{2*b+1} AS VARCHAR))"
    for b in range(N_BANDS)
]


@query(
    "dedup_minhash_pairs",
    oracle="WITH sh AS (SELECT doc_id, " + _DUCK_SHINGLES + """ AS shingles
      FROM documents),
    sig AS (SELECT doc_id, """
    + ", ".join(f"{_duck_minhash(i)} AS mh{i}" for i in range(N_MINHASH))
    + """ FROM sh),
    bands AS (
      SELECT doc_id, unnest(["""
    + ", ".join(_BAND_KEYS_DUCK)
    + """]) AS band_key FROM sig)
    SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
    FROM bands a JOIN bands b
      ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18b-2: banded LSH candidate pairs — docs sharing any of 4 bands
    (2 minhashes each). THIS is the 100 TB near-dup shape: explode to
    (doc, band_key), shuffle on band_key (equi-join), never a cross
    product. Skewed bands (boilerplate dups) are handled by AQE skew
    splitting."""
    sig = dedup_minhash_signature(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[F.expr(k) for k in _BAND_KEYS_SPARK])).alias("band_key"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )


# --------------------------------------------------------------------------
# B18c — MLlib MinHashLSH (approx path, rows-only)
# --------------------------------------------------------------------------


@query("dedup_near_lsh")  # rows-only: MLlib hash families are model-defined
def dedup_near_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18c: MinHashLSH.approxSimilarityJoin over hashed token features —
    the library variant of dedup_minhash_pairs (north-star "Batch index
    build via MLlib"). tests/test_dedup.py checks recall vs exact
    Jaccard pairs."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.expr(_SPARK_TOKS.replace("text", "text")).alias("tokens")
    ).where(F.size("tokens") > 0)
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 16)
    feats = tf.transform(toks)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=5,
                     seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.6, distCol="jaccard_dist")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_id_a"),
            F.col("datasetB.doc_id").alias("doc_id_b"),
            F.col("jaccard_dist"),
        )
    )


# --------------------------------------------------------------------------
# B18d — embedding-cosine near-dup
# --------------------------------------------------------------------------


@query(
    "dedup_embedding",
    oracle=f"""
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           {o_cosine('a.embedding', 'b.embedding')} AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {o_cosine('a.embedding', 'b.embedding')} >= 0.95
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18d: embedding-cosine near-dup pairs (≥0.95), blocked by label.
    At scale the blocking key becomes an LSH bucket (retrieval.lsh) —
    same join shape, model-assigned key."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    cos = cosine_similarity(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= 0.95)
    )

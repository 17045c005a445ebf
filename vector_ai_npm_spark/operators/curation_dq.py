"""Data-quality / governance operators, wave 3: privacy audits, digit-law
checks, embedding hygiene, deletion cascades, and weak-label voting.

Round-7 additions to the DQ family (`dq_checks`, operators/relational.py)
and the curation tier (text/curation.py).  Reference scope note: the
reference client stores raw document text + metadata in Postgres with no
governance surface at all (vector-client.ts:141-152 ingests, nothing
deletes or audits); these are the operators a production corpus store
needs around that surface.

Scale design (100 TB):

* Every op here is a single scan plus key-sized aggregate state —
  k-anonymity groups are |quasi-identifier domain|, Benford state is 9
  rows, hygiene is map-only per vector, the deletion cascade's list is
  broadcast, and majority voting aggregates (id, label) cells.
* No driver collects: corpus-level totals ride the broadcast-1-row-frame
  crossJoin pattern (the scalar-broadcast idiom from analytics_ops.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

# k-anonymity threshold: (lang, source) cell sizes at the sf0.01 oracle
# scale run 1-16 with median 4, so k=5 flags the sparse tail (~half the
# cells) without flagging everything
_K_ANON = 5

# Benford first-digit expectations as PYTHON-computed literals: the same
# double constants are spliced into both engines' SQL, so no in-engine
# log10 (engine-divergent by ulps) ever enters the hash.
_BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


@query(
    "dq_k_anonymity",
    oracle=f"""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS group_n,
           COUNT(*) < {_K_ANON} AS at_risk
    FROM documents
    GROUP BY lang, source
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit: k-anonymity over the (lang, source) quasi-identifier
    pair — any equivalence class smaller than k re-identifies its members
    (Sweeney 2002).  The release-gate check run before publishing any
    row-level extract of the corpus.

    ONE hash aggregate keyed by the quasi-identifier tuple; state is the
    quasi-ID domain size regardless of corpus rows, and partial (map-side)
    aggregation means the shuffle carries one row per (cell × task)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("group_n"),
        (F.count(F.lit(1)) < _K_ANON).alias("at_risk"),
    )


def _benford_case(col: str) -> str:
    """Piecewise expected-probability lookup from the Python literals."""
    whens = " ".join(
        f"WHEN '{d}' THEN CAST({_BENFORD_P[d]!r} AS DOUBLE)"
        for d in range(1, 10)
    )
    return f"CASE {col} {whens} END"


@query(
    "dq_benford",
    oracle=f"""
    WITH digits AS (
      SELECT substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                       1, 1) AS digit
      FROM orders
    ),
    obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS obs FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM digits)
    SELECT obs.digit, obs.obs,
           CAST(tot.n AS DOUBLE) * {_benford_case('obs.digit')} AS expected_n,
           ((CAST(obs.obs AS DOUBLE)
             - CAST(tot.n AS DOUBLE) * {_benford_case('obs.digit')})
            * (CAST(obs.obs AS DOUBLE)
               - CAST(tot.n AS DOUBLE) * {_benford_case('obs.digit')}))
           / (CAST(tot.n AS DOUBLE) * {_benford_case('obs.digit')})
             AS chi2_term
    FROM obs CROSS JOIN tot
    """,
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraud/DQ screen: first-significant-digit distribution of order
    totals vs Benford's law, with per-digit chi-square contributions —
    the classic fabricated-amounts detector (Nigrini's audit test).

    The digit is extracted through a DECIMAL(18,2) string rendering
    (both engines print decimals identically; double→string would not
    agree), expectations are Python-computed literals so no in-engine
    log enters the hash, and the total rides the broadcast-1-row-frame
    pattern.  State: 9 digit rows regardless of order count; the
    chi-square terms are per-row scalar double ops on identical inputs
    — deterministic without the decimal fold."""
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        ).alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("obs"))
    # the grand total is the sum of the ≤9-row digit aggregate (digits
    # partition orders): a global window over that tiny frame keeps the
    # plan a single scan — no second pass over the fact table, and the
    # single-partition sort is 9 rows by construction
    tot = F.sum("obs").over(Window.partitionBy())
    expected = tot.cast("double") * F.expr(_benford_case("digit"))
    dev = F.col("obs").cast("double") - expected
    return obs.select(
        "digit",
        "obs",
        expected.alias("expected_n"),
        (dev * dev / expected).alias("chi2_term"),
    )


# DuckDB mirror of the strict left-fold squared-norm (functions.vectors
# conventions: prepend the 0.0 accumulator, fold in array order)
_O_SQNORM = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
    "(acc, v) -> acc + v)"
)


@query(
    "embedding_hygiene",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(len(list_filter(embedding,
                x -> isnan(CAST(x AS DOUBLE)) OR isinf(CAST(x AS DOUBLE))))
                AS INT) AS n_nonfinite,
           sqrt({_O_SQNORM}) AS l2_norm,
           {_O_SQNORM} = 0.0 AS is_zero
    FROM embeddings
    """,
)
def embedding_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-build preflight: per-vector hygiene audit — dimension,
    non-finite element count, L2 norm, zero-vector flag.  Run before
    every ANN index build: one NaN reaching an IVF centroid poisons the
    whole cell, and zero vectors make cosine undefined (the engine's
    cosine returns NULL on them, functions/vectors.py:43).

    Map-only: no shuffle at all — each vector is audited in place with
    array higher-order functions in whole-stage codegen, so this runs at
    scan speed over 100 TB of embeddings.  The norm is the strict
    left-fold double sum (functions.vectors discipline) so both engines
    produce identical bits."""
    return hygiene_frame(load_table(spark, sf_dir, "embeddings"))


def hygiene_frame(emb: DataFrame) -> DataFrame:
    """The audit projection over any (vec_id, embedding) frame —
    factored so tests can plant NaN/Inf/zero vectors (the fixture is
    clean, which exercises only the healthy path)."""
    arr = F.col("embedding").cast("array<double>")
    sq = F.aggregate(
        F.transform(arr, lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nonfinite = F.size(
        F.filter(arr, lambda x: F.isnan(x) | (F.abs(x) == float("inf")))
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        nonfinite.alias("n_nonfinite"),
        F.sqrt(sq).alias("l2_norm"),
        (sq == F.lit(0.0)).alias("is_zero"),
    )


# deterministic right-to-be-forgotten request set: every 50th document
_DEL_PRED = "doc_id % 50 = 0"


@query(
    "delete_cascade",
    oracle=f"""
    WITH dels AS (SELECT doc_id FROM documents WHERE {_DEL_PRED}),
    doc_after AS (
      SELECT d.* FROM documents d ANTI JOIN dels USING (doc_id)
    ),
    emb_after AS (
      SELECT e.* FROM embeddings e
      ANTI JOIN dels ON e.vec_id = dels.doc_id
    ),
    orphans AS (
      SELECT COUNT(*) AS c FROM emb_after e
      ANTI JOIN doc_after d ON e.vec_id = d.doc_id
    )
    SELECT 'documents' AS table_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS rows_before,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dels) AS rows_deleted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM doc_after) AS rows_after,
           CAST(0 AS BIGINT) AS orphans_after
    UNION ALL
    SELECT 'embeddings',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings e
            SEMI JOIN dels ON e.vec_id = dels.doc_id),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM emb_after),
           (SELECT CAST(c AS BIGINT) FROM orphans)
    """,
)
def delete_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR right-to-be-forgotten cascade audit: a deletion request set
    (every 50th doc_id here; an uploaded id list in production) cascades
    from documents to their embeddings, and the contract row per table
    reports before/deleted/after counts plus surviving orphans (MUST be
    zero — an embedding outliving its source document is a privacy
    violation and a retrieval-of-deleted-content bug).

    The deletion list is dim-sized → broadcast LEFT ANTI / LEFT SEMI
    joins against each child table (no shuffle of the corpus side);
    counts are exact integer aggregates unioned into the audit frame.
    This is the audit FACE of the delete path the engine facade applies
    to the parquet store (sink rewrite minus the anti-joined rows)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    dels = docs.where(F.expr(_DEL_PRED)).select("doc_id")
    doc_after = docs.join(F.broadcast(dels), "doc_id", "left_anti")
    emb_after = emb.join(
        F.broadcast(dels), emb["vec_id"] == dels["doc_id"], "left_anti"
    )
    orphans = emb_after.join(
        doc_after.select("doc_id"),
        emb_after["vec_id"] == doc_after["doc_id"],
        "left_anti",
    )

    def _cnt(df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("c"))

    doc_row = (
        _cnt(docs).withColumnRenamed("c", "rows_before")
        .crossJoin(_cnt(dels).withColumnRenamed("c", "rows_deleted"))
        .crossJoin(_cnt(doc_after).withColumnRenamed("c", "rows_after"))
        .select(
            F.lit("documents").alias("table_name"),
            "rows_before", "rows_deleted", "rows_after",
            F.lit(0).cast("long").alias("orphans_after"),
        )
    )
    emb_del = emb.join(
        F.broadcast(dels), emb["vec_id"] == dels["doc_id"], "left_semi"
    )
    emb_row = (
        _cnt(emb).withColumnRenamed("c", "rows_before")
        .crossJoin(_cnt(emb_del).withColumnRenamed("c", "rows_deleted"))
        .crossJoin(_cnt(emb_after).withColumnRenamed("c", "rows_after"))
        .crossJoin(_cnt(orphans).withColumnRenamed("c", "orphans_after"))
        .select(
            F.lit("embeddings").alias("table_name"),
            "rows_before", "rows_deleted", "rows_after", "orphans_after",
        )
    )
    return doc_row.unionByName(emb_row)


# three synthetic annotators: annotator i corrupts the gold label with
# ~20% probability, deterministically from md5(vec_id # i) — the
# cross-engine hash idiom (text/curation.py:876).  SHARED with
# label_fleiss_kappa (operators/eval_metrics.py): both QA readouts must
# see the identical votes, so this is the single definition site.
_N_ANN = 3


def _vote_sql_leg(i: int) -> str:
    return f"""
    SELECT vec_id,
           CASE WHEN (CAST('0x' || substring(
                        md5(CAST(vec_id AS VARCHAR) || '#ann{i}'),
                        1, 8) AS BIGINT) % 10) < 2
                THEN (label + {i + 1}) % 10 ELSE label END AS vote
    FROM embeddings
    """


def vote_expr(i: int) -> F.Column:
    """Spark mirror of :func:`_vote_sql_leg`'s vote column."""
    noise = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("vec_id").cast("string"), F.lit(f"#ann{i}"))
                ),
                1, 8,
            ),
            16, 10,
        ).cast("bigint") % 10
    )
    return (
        F.when(noise < 2, (F.col("label") + (i + 1)) % 10)
        .otherwise(F.col("label"))
    )


@query(
    "label_majority_vote",
    oracle=f"""
    WITH votes AS (
      {" UNION ALL ".join(_vote_sql_leg(i) for i in range(_N_ANN))}
    ),
    tallies AS (
      SELECT vec_id, vote, CAST(COUNT(*) AS BIGINT) AS n_votes
      FROM votes GROUP BY vec_id, vote
    ),
    ranked AS (
      SELECT vec_id, vote, n_votes,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY n_votes DESC, vote) AS rn
      FROM tallies
    )
    SELECT vec_id, CAST(vote AS INT) AS voted_label, n_votes,
           n_votes = {_N_ANN} AS unanimous
    FROM ranked WHERE rn = 1
    """,
)
def label_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak-supervision label consolidation: N noisy annotator labels
    per example collapsed by majority vote with a deterministic
    lowest-label tiebreak — the RLHF / crowd-labeling aggregation step
    (Dawid-Skene's count-only special case).

    Annotators are synthesized deterministically (md5-derived 20% label
    corruption per annotator) so both engines see identical votes.  The
    N votes explode from an in-row array — ONE scan of the table (the
    oracle's UNION ALL legs are equivalent by value; DuckDB rescans its
    own views, which is its business) — tallies aggregate (id, label)
    cells, and the top-1 rank filter plans as WindowGroupLimit so
    per-example state is one row.  At corpus scale this is one shuffle
    keyed by vec_id."""
    emb = load_table(spark, sf_dir, "embeddings")

    votes = emb.select(
        "vec_id",
        F.explode(F.array(*[vote_expr(i) for i in range(_N_ANN)])).alias("vote"),
    )
    tallies = votes.groupBy("vec_id", "vote").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("n_votes"), F.col("vote"))
    return (
        tallies.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("vote").cast("int").alias("voted_label"),
            "n_votes",
            (F.col("n_votes") == _N_ANN).alias("unanimous"),
        )
    )


_STRAT_K = 10


@query(
    "sample_stratified_k",
    oracle=f"""
    SELECT lang, doc_id
    FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '#stratk'), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= {_STRAT_K}
    """,
)
def sample_stratified_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k stratified sample: k docs per language by md5 rank — the
    deterministic eval-set / human-review draw (every stratum gets
    exactly min(k, n) members, unlike Bernoulli sampling's variance;
    the hash order is seedless and partitioning-stable, the
    curate_split_train_val discipline).

    One shuffle keyed by stratum; rank ≤ k plans as WindowGroupLimit so
    per-stratum state is k rows — at 100 TB the draw never holds a
    stratum's full membership."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#stratk")))
    w = Window.partitionBy("lang").orderBy(key, F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _STRAT_K)
        .select("lang", "doc_id")
    )


@query(
    "dq_l_diversity",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS group_n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l_distinct,
           COUNT(DISTINCT user_id) < 5 AS at_risk
    FROM events
    GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    """,
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit, the k-anonymity sibling: distinct-l-diversity
    (Machanavajjhala 2007) over the (event_type, day) quasi-identifier —
    a cell whose rows all belong to < l distinct users leaks the
    sensitive attribute (who acted) even when the cell itself is large,
    the attack k-anonymity misses.  Release gate for event-log extracts,
    next to `dq_k_anonymity`'s document gate.

    Exact COUNT DISTINCT plans as the two-phase expand: partial dedup on
    (cell, user) then a cell count — shuffle state is distinct
    (cell, user) PAIRS, sublinear in events; the quasi-ID frame itself
    is |types|×|days| rows."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date").alias("day")
    return ev.groupBy("event_type", day).agg(
        F.count(F.lit(1)).alias("group_n"),
        F.countDistinct("user_id").alias("l_distinct"),
        (F.countDistinct("user_id") < 5).alias("at_risk"),
    )

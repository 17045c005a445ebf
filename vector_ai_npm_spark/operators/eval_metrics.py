"""Model-eval and feature-engineering metrics (wave 13).

Five operators a training-data/eval pipeline runs next to curation:

* `eval_auc_rank` — exact ROC AUC via the Mann-Whitney rank-sum
  identity (AUC = U / (n_pos * n_neg)), with tie-corrected average
  ranks.  The rank prefix sums are TWO-LEVEL (bucketed carries, the
  streaming/windows.py::late_events discipline) so no corpus-scale
  frame ever passes through an unpartitioned window.
* `feature_target_encode_loo` — leave-one-out target (mean) encoding
  of a categorical column, the standard high-cardinality feature
  encoding that avoids self-leakage: enc(row) = (sum(cat) - y_row)
  / (n(cat) - 1).  One category aggregate (5 rows) broadcast back.
* `label_fleiss_kappa` — inter-annotator chance-corrected agreement
  (Fleiss 1971) over the same deterministic 3-annotator synthesis as
  `label_majority_vote` (operators/curation_dq.py:281) — the dataset
  QA readout before trusting crowd labels.
* `eval_calibration_bins` — reliability-diagram components (bin
  count, mean predicted score, empirical positive rate, |gap|) over
  fixed decile bins; ECE is the n-weighted gap sum.  Scores are
  synthesized deterministically from md5(vec_id) + label so both
  engines see identical fixtures (the curation_dq annotator idiom).
* `feature_hash_bucket` — the hashing trick (Weinberger et al. 2009):
  terms hashed into 2^10 buckets, per-bucket token/term tallies and
  the dominant term — the fixed-width featurizer that needs no
  vocabulary broadcast at 100 TB.

Reference scope note: the reference (vector-client.ts) has no eval or
feature-engineering surface; this extends the retrieval_eval_ndcg /
eval_pass_at_k evaluation family (north-star scope).

Cross-engine determinism: every statistic folds through exact integer
or decimal arithmetic (counts as BIGINT, wide products as
DECIMAL(19,0)xDECIMAL(19,0) -> DECIMAL(38,0) in BOTH engines — Spark
clamps 39->38 losslessly at scale 0, DuckDB derives 38 directly), and
each final float is ONE identical left-to-right double expression per
engine, with every decimal->double hop through the o_dsum varchar
bridge on the DuckDB side (functions/numeric.py).

Scale notes per operator are in the docstrings; the common theme is
that only aggregate frames (distinct scores, 5 categories, 10 bins,
1024 buckets, per-bucket carries) are ever re-shuffled or windowed —
the corpus is scanned once and reduced in the first aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vector_ai_npm_spark.functions.prefix import cum_before
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

# decimal->double through VARCHAR on the DuckDB side (exact; see
# functions/numeric.py::o_dsum for why the direct cast double-rounds)
def _o_d2d(expr: str) -> str:
    return f"CAST(CAST(({expr}) AS VARCHAR) AS DOUBLE)"


def _spark_hash_mod(col: Column, salt: str, mod: int) -> Column:
    """First 8 md5 hex digits as BIGINT, mod `mod` — the deterministic
    cross-engine randomness idiom (operators/curation_dq.py:281)."""
    return (
        F.conv(F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 8), 16, 10)
        .cast("bigint") % mod
    )


def _duck_hash_mod(expr: str, salt: str, mod: int) -> str:
    return (
        f"(CAST('0x' || substring(md5(CAST({expr} AS VARCHAR) || '{salt}'), 1, 8) "
        f"AS BIGINT) % {mod})"
    )


# --------------------------------------------------------------------------
# eval_auc_rank
# --------------------------------------------------------------------------

# integer cents from a 2-decimal double: floor(x*100 + 0.5) is engine-
# identical (x*100 lands within 1e-10 of the integer; CAST double->BIGINT
# truncates in Spark but ROUNDS in DuckDB, so never cast the raw product)
_CENTS_SQL = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"

_AUC_BUCKET = 10_000  # score-range width per carry bucket (cents)


@query(
    "eval_auc_rank",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM({_CENTS_SQL}) AS BIGINT) AS cents,
             CASE WHEN CAST(COUNT(CASE WHEN event_type = 'purchase'
                                       THEN 1 END) AS BIGINT) * 5
                       > CAST(COUNT(*) AS BIGINT)
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS pos
      FROM events GROUP BY user_id
    ), by_score AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(pos) AS BIGINT) AS cnt_pos
      FROM per_user GROUP BY cents
    ), ranked AS (
      SELECT cnt, cnt_pos,
             COALESCE(SUM(cnt) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM by_score
    ), folded AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n_users,
             CAST(SUM(cnt_pos) AS BIGINT) AS n_pos,
             CAST(SUM(cnt - cnt_pos) AS BIGINT) AS n_neg,
             CAST(SUM(CAST(cnt_pos AS DECIMAL(19,0))
                      * CAST(2 * cum_before + cnt + 1 AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS s2_pos
      FROM ranked
    )
    SELECT n_users, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             {_o_d2d("s2_pos - CAST(n_pos AS DECIMAL(19,0)) * CAST(n_pos + 1 AS DECIMAL(19,0))")}
               / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
           END AS auc
    FROM folded
    """,
)
def eval_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC AUC of "total spend (cents) predicts
    heavy purchaser (purchase share above the uniform 1/5 rate)" per
    user, via Mann-Whitney: with S = sum of average
    ranks of positives (ascending score), U = S - n_pos(n_pos+1)/2 and
    AUC = U / (n_pos * n_neg).  Average rank of a tied score group is
    (rank_lo + rank_hi)/2, so 2S = sum cnt_pos * (2*cum_before + cnt
    + 1) stays integer.

    Scale: one user-keyed aggregate, one score-keyed aggregate (the
    distinct-score frame), then the cumulative counts come from the
    TWO-LEVEL prefix (partitioned within score-range buckets + one
    unpartitioned carry window over the per-bucket aggregate — bounded
    by score range / bucket width, never by corpus rows), and a 1-row
    fold.  Products ride DECIMAL(19,0)x(19,0)->(38,0) so 1e11-user rank
    sums cannot overflow BIGINT."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.expr(_CENTS_SQL)).cast("bigint").alias("cents"),
        F.when(
            F.count(F.when(F.col("event_type") == "purchase", 1)).cast("bigint")
            * 5
            > F.count(F.lit(1)).cast("bigint"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("pos"),
    )
    by_score = per_user.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("pos").cast("bigint").alias("cnt_pos"),
    )
    ranked = cum_before(by_score, "cents", "cnt", _AUC_BUCKET)
    d19 = "decimal(19,0)"
    folded = ranked.agg(
        F.sum("cnt").cast("bigint").alias("n_users"),
        F.sum("cnt_pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("cnt_pos")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("cnt_pos").cast(d19)
            * (F.lit(2) * F.col("cum_before") + F.col("cnt") + F.lit(1)).cast(d19)
        )
        .cast("decimal(38,0)")
        .alias("s2_pos"),
    )
    u2 = (
        F.col("s2_pos")
        - F.col("n_pos").cast(d19) * (F.col("n_pos") + F.lit(1)).cast(d19)
    ).cast("double")
    return folded.select(
        "n_users",
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            u2
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            ),
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# feature_target_encode_loo
# --------------------------------------------------------------------------

_D4 = "DECIMAL(18,4)"


@query(
    "feature_target_encode_loo",
    oracle=f"""
    WITH cat AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_cat,
             CAST(SUM(CAST(o_totalprice AS {_D4})) AS DECIMAL(28,4)) AS s_cat
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey, o.o_orderpriority, c.n_cat,
           CASE WHEN c.n_cat > 1 THEN
             {_o_d2d(f"CAST(c.s_cat - CAST(o.o_totalprice AS {_D4}) AS DECIMAL(28,4))")}
               / CAST(c.n_cat - 1 AS DOUBLE)
           END AS loo_enc
    FROM orders o JOIN cat c USING (o_orderpriority)
    """,
)
def feature_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out mean target encoding: each order's priority is
    replaced by the mean o_totalprice of all OTHER orders sharing it —
    (sum(cat) - y) / (n(cat) - 1), the leakage-free form used for
    high-cardinality categoricals in GBDT/linear feature pipelines.

    Exactness: per-row prices cast to DECIMAL(18,4) (2-decimal values
    ≪ the 1e9 identity bound, functions/numeric.py), category sums and
    the subtraction stay exact decimal, ONE double division at the end
    (numerator via the varchar bridge in DuckDB).

    Scale: one category aggregate (5 rows here; even 1e6 categories is
    a broadcastable dim) broadcast-joined back to the fact — the fact
    table never shuffles."""
    d4 = _D4.lower()
    orders = load_table(spark, sf_dir, "orders")
    cat = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cat"),
        F.sum(F.col("o_totalprice").cast(d4)).cast("decimal(28,4)").alias("s_cat"),
    )
    return (
        orders.join(F.broadcast(cat), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "n_cat",
            F.when(
                F.col("n_cat") > 1,  # a singleton category has no LOO mean
                (F.col("s_cat") - F.col("o_totalprice").cast(d4))
                .cast("decimal(28,4)")
                .cast("double")
                / (F.col("n_cat") - F.lit(1)).cast("double"),
            ).alias("loo_enc"),
        )
    )


# --------------------------------------------------------------------------
# label_fleiss_kappa
# --------------------------------------------------------------------------

# the SAME deterministic 3-annotator corruption as label_majority_vote:
# imported from its single definition site (operators/curation_dq.py)
# so the two QA readouts can never drift apart on the vote synthesis
from vector_ai_npm_spark.operators.curation_dq import (  # noqa: E402
    _N_ANN,
    _vote_sql_leg,
    vote_expr,
)


@query(
    "label_fleiss_kappa",
    oracle=f"""
    WITH votes AS (
      {" UNION ALL ".join(_vote_sql_leg(i) for i in range(_N_ANN))}
    ), cells AS (
      SELECT vec_id, vote, CAST(COUNT(*) AS BIGINT) AS nij
      FROM votes GROUP BY vec_id, vote
    ), item_fold AS (
      SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_items,
             CAST(SUM(nij * nij) AS BIGINT) AS sum_nij2
      FROM cells
    ), cat_fold AS (
      SELECT CAST(SUM(CAST(cj AS DECIMAL(19,0)) * CAST(cj AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS sum_cj2
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS cj FROM votes GROUP BY vote)
    )
    SELECT n_items,
           CAST({_N_ANN} AS BIGINT) AS n_raters,
           CAST(sum_nij2 - n_items * {_N_ANN} AS DOUBLE)
             / CAST(n_items * {_N_ANN} * {_N_ANN - 1} AS DOUBLE) AS p_bar,
           {_o_d2d("sum_cj2")}
             / (CAST(n_items * {_N_ANN} AS DOUBLE)
                * CAST(n_items * {_N_ANN} AS DOUBLE)) AS p_e,
           ((CAST(sum_nij2 - n_items * {_N_ANN} AS DOUBLE)
             / CAST(n_items * {_N_ANN} * {_N_ANN - 1} AS DOUBLE))
            - ({_o_d2d("sum_cj2")}
               / (CAST(n_items * {_N_ANN} AS DOUBLE)
                  * CAST(n_items * {_N_ANN} AS DOUBLE))))
           / (1.0 - ({_o_d2d("sum_cj2")}
                     / (CAST(n_items * {_N_ANN} AS DOUBLE)
                        * CAST(n_items * {_N_ANN} AS DOUBLE)))) AS kappa
    FROM item_fold CROSS JOIN cat_fold
    """,
)
def label_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over the synthetic 3-annotator votes: P_bar (mean
    observed pairwise agreement) = (sum_ij n_ij^2 - N*n) / (N*n*(n-1)),
    P_e (chance agreement) = sum_j c_j^2 / (N*n)^2, kappa =
    (P_bar - P_e) / (1 - P_e).  Everything until the three final double
    expressions is integer: n_ij <= 3 so sum n_ij^2 fits BIGINT at any
    corpus size; the category totals c_j are corpus-sized so THEIR
    squares fold as DECIMAL(19,0)^2 -> (38,0).

    Scale: one (item, vote)-keyed aggregate (votes explode from an
    in-row array — one scan), one 10-row category aggregate, two 1-row
    folds cross-joined.  Nothing wider than the cells frame shuffles."""
    emb = load_table(spark, sf_dir, "embeddings")

    votes = emb.select(
        "vec_id",
        F.explode(
            F.array(*[vote_expr(i) for i in range(_N_ANN)])
        ).alias("vote"),
    )
    cells = votes.groupBy("vec_id", "vote").agg(
        F.count(F.lit(1)).cast("bigint").alias("nij")
    )
    item_fold = cells.agg(
        F.countDistinct("vec_id").cast("bigint").alias("n_items"),
        F.sum(F.col("nij") * F.col("nij")).cast("bigint").alias("sum_nij2"),
    )
    d19 = "decimal(19,0)"
    cat_fold = (
        votes.groupBy("vote")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cj"))
        .agg(
            F.sum(F.col("cj").cast(d19) * F.col("cj").cast(d19))
            .cast("decimal(38,0)")
            .alias("sum_cj2")
        )
    )
    n = F.lit(_N_ANN).cast("bigint")
    joined = item_fold.crossJoin(F.broadcast(cat_fold))
    p_bar = (
        (F.col("sum_nij2") - F.col("n_items") * _N_ANN).cast("double")
        / (F.col("n_items") * _N_ANN * (_N_ANN - 1)).cast("double")
    )
    nn_dbl = (F.col("n_items") * _N_ANN).cast("double")
    p_e = F.col("sum_cj2").cast("double") / (nn_dbl * nn_dbl)
    return joined.select(
        "n_items",
        n.alias("n_raters"),
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        ((p_bar - p_e) / (F.lit(1.0) - p_e)).alias("kappa"),
    )


# --------------------------------------------------------------------------
# shared model-score fixture
# --------------------------------------------------------------------------
#
# ONE deterministic synthetic model score shared by every eval readout
# (calibration bins, isotonic fit, confusion sweep, average precision):
# md5 noise in [0, 600) milli-units + 350 for true positives (label<5),
# +50 for negatives — overlapping, so the "model" is informative but
# imperfect.  Single definition site; the production swap-in is a real
# score column with the same (pos, s_milli) shape.

CAL_SCORED_SQL = f"""
      SELECT CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos,
             {_duck_hash_mod("vec_id", "#cal", 600)}
               + CASE WHEN label < 5 THEN 350 ELSE 50 END AS s_milli
      FROM embeddings
"""


def cal_scored(emb: DataFrame) -> DataFrame:
    """Spark mirror of :data:`CAL_SCORED_SQL` — (pos, s_milli) frame."""
    return emb.select(
        F.when(F.col("label") < 5, 1).otherwise(0).alias("pos"),
        (
            _spark_hash_mod(F.col("vec_id"), "#cal", 600)
            + F.when(F.col("label") < 5, 350).otherwise(50)
        ).alias("s_milli"),
    )


# --------------------------------------------------------------------------
# eval_calibration_bins
# --------------------------------------------------------------------------


@query(
    "eval_calibration_bins",
    oracle=f"""
    WITH scored AS (
{CAL_SCORED_SQL}
    )
    SELECT CAST(FLOOR(s_milli / 100) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_examples,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           ({_o_d2d("CAST(SUM(CAST(s_milli AS DECIMAL(19,0))) AS DECIMAL(38,0))")}
              / CAST(COUNT(*) AS DOUBLE)) / 1000.0 AS mean_score,
           CAST(SUM(pos) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS frac_pos,
           ABS((CAST(SUM(pos) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
               - ({_o_d2d("CAST(SUM(CAST(s_milli AS DECIMAL(19,0))) AS DECIMAL(38,0))")}
                  / CAST(COUNT(*) AS DOUBLE)) / 1000.0) AS abs_gap
    FROM scored GROUP BY CAST(FLOOR(s_milli / 100) AS BIGINT)
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram components over fixed decile bins of a
    deterministic synthetic score (md5 noise in [0,600) milli-units +
    350 for true positives, +50 for negatives — overlapping, so the
    model is informative but imperfectly calibrated).  Per bin: count,
    mean predicted score, empirical positive rate and |gap|; ECE is
    the n-weighted gap sum downstream.

    Scale: map-only scoring + one <=10-row aggregate; score sums fold
    as DECIMAL(38,0) so milli-unit totals never hit the 2^53 double
    cliff.  The production swap-in is a real model-score column — the
    bin/fold shapes are unchanged."""
    scored = cal_scored(load_table(spark, sf_dir, "embeddings"))
    agg = scored.groupBy(
        F.floor(F.col("s_milli") / F.lit(100)).cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_examples"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("s_milli").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("s_sum"),
    )
    mean_score = (
        F.col("s_sum").cast("double") / F.col("n_examples").cast("double")
    ) / F.lit(1000.0)
    frac_pos = F.col("n_pos").cast("double") / F.col("n_examples").cast("double")
    return agg.select(
        "bin",
        "n_examples",
        "n_pos",
        mean_score.alias("mean_score"),
        frac_pos.alias("frac_pos"),
        F.abs(frac_pos - mean_score).alias("abs_gap"),
    )


# --------------------------------------------------------------------------
# feature_hash_bucket
# --------------------------------------------------------------------------

_N_BUCKETS = 1024

# shared token fragments (dedup/queries.py:43 — kept textually parallel)
_SPARK_TOKS = "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
_DUCK_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"


@query(
    "feature_hash_bucket",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_DUCK_TOKS}) AS term FROM documents
    ), vocab AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS term_n
      FROM toks GROUP BY term
    ), per_term AS (
      -- bucket hash on the VOCABULARY frame, never per token occurrence
      SELECT {_duck_hash_mod("term", "#fh", _N_BUCKETS)} AS bucket,
             term, term_n
      FROM vocab
    ), ranked AS (
      SELECT bucket, term, term_n,
             CAST(SUM(term_n) OVER (PARTITION BY bucket) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS n_terms,
             ROW_NUMBER() OVER (PARTITION BY bucket
                                ORDER BY term_n DESC, term) AS rn
      FROM per_term
    )
    SELECT bucket, n_terms, n_tokens, term AS top_term
    FROM ranked WHERE rn = 1
    """,
)
def feature_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: every corpus term maps to md5 % 1024 — a
    fixed-width feature space needing no vocabulary broadcast (the
    100 TB featurizer for linear/GBDT baselines).  Per bucket: distinct
    terms (collision load), total token mass, and the dominant term
    (deterministic count-desc/lexicographic tiebreak) for
    interpretability audits.

    Scale: one corpus scan + explode, a (term)-keyed aggregate
    (vocabulary-sized — Heaps' law, ~n^0.5), then all windows are keyed
    by the 1024-value bucket over the vocabulary frame and the top-1
    filter plans as WindowGroupLimit.  The corpus never re-shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    # count per term FIRST (the only corpus-scale shuffle), then hash on
    # the vocabulary frame: one md5 per TERM, not per token occurrence
    per_term = (
        docs.select(F.explode(F.expr(_SPARK_TOKS)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("term_n"))
        .withColumn(
            "bucket", _spark_hash_mod(F.col("term"), "#fh", _N_BUCKETS)
        )
    )
    wb = W.partitionBy("bucket")
    wr = W.partitionBy("bucket").orderBy(F.desc("term_n"), F.col("term"))
    return (
        per_term.withColumn("n_tokens", F.sum("term_n").over(wb).cast("bigint"))
        .withColumn("n_terms", F.count(F.lit(1)).over(wb).cast("bigint"))
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select("bucket", "n_terms", "n_tokens", F.col("term").alias("top_term"))
    )

"""Wave 21: TVD drift, time-decay attribution, readability, Gwet AC1,
Gini impurity, peak detection.

Six operators extending the experimentation / attribution / text-QA /
agreement / feature families, each exact and oracle-checked:

* `drift_tvd_bins` — total-variation distance between the A/B arms'
  purchase-value distributions over unit-value bins.  The ln-free
  member of the drift family (KS = max CDF gap, chi-square = token
  drift, TVD = half L1 over binned masses): TVD = Σ|a_i·n_b − b_i·n_a|
  / (2·n_a·n_b) is an EXACT integer fraction — no ln/erf anywhere, the
  `drift_token_chisq` decision applied to the divergence family (KL/JS
  need ln(), which is engine-divergent by 1 ulp).
* `attribution_time_decay` — the third classic multi-touch model next
  to `attribution_first_touch` and `attribution_linear`: each touch in
  the 7-day lookback is weighted 2^(6−d) for whole-day age d ∈ 0..6
  (newest day weight 64, oldest 1 — a 1-day half-life).  Credits are
  an exact integer MICRO-LEDGER: per-touch micro-credit =
  floor(value·w·10⁶/Σw + ½), which uses only correctly-rounded double
  ops + floor so both engines produce the identical int64 (the dsum
  scale-8 decimal rounding is NOT engine-identical here — power-of-two
  weights make credit shortest-reprs END at scale-8 half-way points
  while the binary value sits a hair below, measured: 0.557890625 →
  Spark's repr-rounding says …63, DuckDB's exact-binary says …62; the
  mechanism is pinned in tests/test_ledger_properties.py).  Channel totals
  reconcile to revenue within 0.5 µ-units per touch (documented
  ledger rounding, the currency-micro convention).
* `text_readability` — Flesch reading-ease per source from three
  integer counts (alpha-word runs, vowel-group syllable approximation,
  sentence-ender runs): 206.835 − 1.015·(W/S) − 84.6·(Y/W) — every
  term rational from corpus-level integer sums, no transcendentals.
  The quality gate crawl pipelines put next to Gopher filters.
* `eval_gwet_ac1` — Gwet's AC1 chance-corrected agreement over the
  shared 3-annotator vote fixture (curation_dq._vote_sql_leg), the
  paradox-resistant alternative to Fleiss kappa (stable when the
  label distribution is skewed).  With r=3 raters and Q=10 categories
  AC1 reduces to the exact int64 fraction
  (3·A·N·(Q−1) − 2·B) / (2·(9·N²·(Q−1) − B)) with
  A = Σ_items Σ_q r_iq(r_iq−1) and B = Σ_q T_q(3N−T_q).
* `feature_gini_impurity` — per-source Gini impurity of the language
  distribution (1 − Σp²): the split-quality readout feature stores
  publish next to WOE/IV, and the rational twin of entropy-based
  usefulness (ln-free by construction).  imp = (n² − Σc²)/n² exact.
* `events_peak_detect` — strict local maxima of the per-type daily
  count series over observed days (lag/lead integer comparisons):
  the "which days spiked" QA readout next to `events_cusum_drift`
  (changepoints) and `events_anomaly_seasonal` (seasonal residuals).

Cross-engine determinism follows the wave-13 contract: integer/decimal
folds only; each final float is ONE identical double expression in
both engines (correctly-rounded ops on identical inputs); doubles that
must fold (time-decay credits) are quantized to an int64 micro-ledger
first — floor-based, never decimal-rounding-based.

Scale shape: every metric reduces the corpus in its FIRST aggregate
(unit-value bins / per-(type,day) counts / per-source sums /
per-(item,category) vote tallies) and later stages run on the reduced
frame.  The attribution pair join is the user-equi + time-post-filter
contract of attribution_linear (shuffle key user_id, per-user fan-out
bounded by activity-rate × window, AQE skew-splittable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.curation_dq import _N_ANN, _vote_sql_leg, vote_expr
from vector_ai_npm_spark.operators.experiment_ops import _DUCK_ARM, _SPARK_ARM
from vector_ai_npm_spark.registry import query

_D19 = "decimal(19,0)"
_D38 = "decimal(38,0)"


@query(
    "drift_tvd_bins",
    oracle=f"""
    WITH p AS (
      SELECT CAST(FLOOR(value) AS BIGINT) AS bin, {_DUCK_ARM} AS arm
      FROM events WHERE event_type = 'purchase'
    ),
    per_bin AS (
      SELECT bin,
             CAST(COUNT(*) FILTER (WHERE arm = 'control') AS BIGINT) AS a,
             CAST(COUNT(*) FILTER (WHERE arm = 'treatment') AS BIGINT) AS b
      FROM p GROUP BY bin
    ),
    tot0 AS (
      SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b
      FROM per_bin
    ),
    folded AS (
      SELECT MAX(n_a) AS n_a, MAX(n_b) AS n_b,
             CAST(COUNT(*) AS BIGINT) AS n_bins,
             CAST(SUM(ABS(CAST(a AS DECIMAL(38,0)) * n_b
                          - CAST(b AS DECIMAL(38,0)) * n_a))
                  AS BIGINT) AS tvd_num
      FROM per_bin CROSS JOIN tot0
    )
    SELECT n_a, n_b, n_bins, tvd_num,
           CAST(2 * CAST(n_a AS DECIMAL(38,0)) * n_b AS BIGINT) AS tvd_den,
           CAST(tvd_num AS DOUBLE)
             / CAST(2 * CAST(n_a AS DECIMAL(38,0)) * n_b AS DOUBLE) AS tvd
    FROM folded
    """,
)
def drift_tvd_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation drift between the arms' binned purchase values —
    see module docstring.  One purchase-filtered aggregate to the
    unit-value bin frame (bounded by the value range), then a 1-row
    fold; cross-products ride DECIMAL(38,0) so n_a·n_b never overflows
    int64 (outputs stay BIGINT — beyond ~2e9 purchases per arm keep
    the decimal, the drift_ks_arms bound)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.floor("value").cast("bigint").alias("bin"),
        F.expr(_SPARK_ARM).alias("arm"),
    )
    per_bin = p.groupBy("bin").agg(
        F.count(F.when(F.col("arm") == "control", 1)).cast("bigint").alias("a"),
        F.count(F.when(F.col("arm") == "treatment", 1))
        .cast("bigint")
        .alias("b"),
    )
    tot0 = per_bin.agg(
        F.sum("a").cast("bigint").alias("t_a"),
        F.sum("b").cast("bigint").alias("t_b"),
    )
    gap = F.abs(
        F.col("a").cast(_D38) * F.col("t_b")
        - F.col("b").cast(_D38) * F.col("t_a")
    )
    tot = per_bin.crossJoin(F.broadcast(tot0)).agg(
        F.max("t_a").cast("bigint").alias("n_a"),
        F.max("t_b").cast("bigint").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum(gap).cast("bigint").alias("tvd_num"),
    )
    den = (F.lit(2) * F.col("n_a").cast(_D38) * F.col("n_b"))
    return tot.select(
        "n_a",
        "n_b",
        "n_bins",
        "tvd_num",
        den.cast("bigint").alias("tvd_den"),
        (F.col("tvd_num").cast("double") / den.cast("double")).alias("tvd"),
    )


_LOOKBACK = "INTERVAL 7 DAY"
_TOUCH_TYPES = ("click", "view")
_US_PER_DAY = 86_400_000_000


@query(
    "attribution_time_decay",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts, value
      FROM events WHERE event_type = 'purchase'
    ), t AS (
      SELECT user_id, ts AS tts, event_type AS channel
      FROM events WHERE event_type IN {_TOUCH_TYPES}
    ), pair AS MATERIALIZED (
      SELECT p.pid, p.value, t.channel,
             CAST(POWER(2, 6 - (epoch_us(p.pts) - epoch_us(t.tts))
                           // {_US_PER_DAY}) AS BIGINT) AS w
      FROM p JOIN t ON p.user_id = t.user_id
        AND t.tts < p.pts AND t.tts > p.pts - {_LOOKBACK}
    ), shared AS (
      SELECT pid, value, channel, w,
             CAST(SUM(w) OVER (PARTITION BY pid) AS BIGINT) AS sw
      FROM pair
    ), credited AS (
      SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
             CAST(SUM(CAST(FLOOR(value * CAST(w * 1000000 AS DOUBLE)
                                 / CAST(sw AS DOUBLE) + 0.5) AS BIGINT))
                  AS BIGINT) AS credit_micro
      FROM shared GROUP BY channel
    ), direct AS (
      SELECT 'direct' AS channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
             CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS credit_micro
      FROM p ANTI JOIN pair ON p.pid = pair.pid
    )
    SELECT channel, n_touches, credit_micro,
           CAST(credit_micro AS DOUBLE) / 1000000 AS credit
    FROM (SELECT * FROM credited
          UNION ALL
          SELECT * FROM direct WHERE n_touches > 0)
    """,
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution — see module docstring.
    Same user-equi pair contract as attribution_linear; the weight
    2^(6−d) is an exact power of two (d = whole-day age, 0..6 inside
    the 7-day lookback) and credits fold as the exact int64
    micro-ledger (floor(x·10⁶+½) — engine-identical by construction,
    unlike decimal scale-8 rounding where repr-vs-binary diverges at
    half-way reprs)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        F.col("ts").alias("pts"), "value",
    )
    t = ev.where(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        "user_id", F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    # NTZ-safe whole-day age (growth_ops epoch idiom)
    age_days = F.expr(
        f"timestampdiff(MICROSECOND, tts, pts) div {_US_PER_DAY}"
    )
    pair = (
        p.join(t, "user_id")
        .where(
            # STRICT lower bound: a touch EXACTLY 7 days old would get
            # whole-day age 7 → weight 2^-1 = 0.5, which Spark's bigint
            # cast truncates to 0 while DuckDB's CAST rounds to 1 — a
            # cross-engine divergence on the boundary (round-8 advice).
            # Strict > keeps age in 0..6 so every weight is an exact
            # integer power of two in both engines.
            (F.col("tts") < F.col("pts"))
            & (F.col("tts") > F.col("pts") - F.expr(_LOOKBACK))
        )
        .select(
            "pid", "value", "channel",
            F.pow(F.lit(2.0), F.lit(6) - age_days).cast("bigint").alias("w"),
        )
    )
    shared = pair.select(
        "pid", "value", "channel", "w",
        F.sum("w").over(Window.partitionBy("pid")).cast("bigint").alias("sw"),
    )
    micro = F.floor(
        F.col("value")
        * (F.col("w") * 1000000).cast("double")
        / F.col("sw").cast("double")
        + F.lit(0.5)
    ).cast("bigint")
    credited = shared.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum(micro).cast("bigint").alias("credit_micro"),
    )
    direct = (
        p.join(pair.select("pid"), "pid", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(
                F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
            )
            .cast("bigint")
            .alias("credit_micro"),
        )
        .select(
            F.lit("direct").alias("channel"), "n_touches", "credit_micro"
        )
        .where(F.col("n_touches") > 0)
    )
    return credited.unionByName(direct).select(
        "channel", "n_touches", "credit_micro",
        (F.col("credit_micro").cast("double") / F.lit(1000000.0)).alias(
            "credit"
        ),
    )


# readability counts: alpha-word runs, vowel-group syllable
# approximation (the classic [aeiouy]+ heuristic), sentence-ender runs
# clamped to ≥1 — all regexp-run COUNTS, deterministic in both engines
_WORD_RE = "[a-z]+"
_SYL_RE = "[aeiouy]+"
_SENT_RE = "[.!?]+"


@query(
    "text_readability",
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
             CAST(len(regexp_extract_all(lower(text), '{_WORD_RE}'))
                  AS BIGINT) AS w,
             CAST(len(regexp_extract_all(lower(text), '{_SYL_RE}'))
                  AS BIGINT) AS y,
             CAST(GREATEST(len(regexp_extract_all(text, '{_SENT_RE}')), 1)
                  AS BIGINT) AS s
      FROM documents
    ),
    per_source AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(w) AS BIGINT) AS words,
             CAST(SUM(y) AS BIGINT) AS syllables,
             CAST(SUM(s) AS BIGINT) AS sentences
      FROM per_doc GROUP BY source
    )
    SELECT source, n_docs, words, syllables, sentences,
           206.835 - 1.015 * (CAST(words AS DOUBLE)
                              / CAST(sentences AS DOUBLE))
                   - 84.6 * (CAST(syllables AS DOUBLE)
                             / CAST(words AS DOUBLE)) AS flesch,
           CASE
             WHEN 206.835 - 1.015 * (CAST(words AS DOUBLE)
                                     / CAST(sentences AS DOUBLE))
                          - 84.6 * (CAST(syllables AS DOUBLE)
                                    / CAST(words AS DOUBLE)) >= 70 THEN 'easy'
             WHEN 206.835 - 1.015 * (CAST(words AS DOUBLE)
                                     / CAST(sentences AS DOUBLE))
                          - 84.6 * (CAST(syllables AS DOUBLE)
                                    / CAST(words AS DOUBLE)) >= 50
               THEN 'standard'
             WHEN 206.835 - 1.015 * (CAST(words AS DOUBLE)
                                     / CAST(sentences AS DOUBLE))
                          - 84.6 * (CAST(syllables AS DOUBLE)
                                    / CAST(words AS DOUBLE)) >= 30
               THEN 'difficult'
             ELSE 'very_difficult'
           END AS band
    FROM per_source
    WHERE words > 0
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Flesch reading ease — see module docstring.  One
    documents scan to per-doc integer counts (map-side), one
    source-keyed aggregate; the flesch double is the identical
    expression in both engines over the same integer sums, and the
    band CASE compares that double to integer literals (deterministic
    because the double itself is bit-equal)."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.size(F.expr(f"regexp_extract_all(lower(text), '{_WORD_RE}', 0)"))
        .cast("bigint")
        .alias("w"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{_SYL_RE}', 0)"))
        .cast("bigint")
        .alias("y"),
        F.greatest(
            F.size(F.expr(f"regexp_extract_all(text, '{_SENT_RE}', 0)")),
            F.lit(1),
        )
        .cast("bigint")
        .alias("s"),
    )
    per_source = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("words"),
        F.sum("y").cast("bigint").alias("syllables"),
        F.sum("s").cast("bigint").alias("sentences"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("words").cast("double") / F.col("sentences").cast("double"))
        - F.lit(84.6)
        * (F.col("syllables").cast("double") / F.col("words").cast("double"))
    )
    band = (
        F.when(flesch >= 70, "easy")
        .when(flesch >= 50, "standard")
        .when(flesch >= 30, "difficult")
        .otherwise("very_difficult")
    )
    return per_source.where(F.col("words") > 0).select(
        "source", "n_docs", "words", "syllables", "sentences",
        flesch.alias("flesch"), band.alias("band"),
    )


_Q_CATS = 10  # fixture labels are 0..9


@query(
    "eval_gwet_ac1",
    oracle=f"""
    WITH votes AS (
      {" UNION ALL ".join(_vote_sql_leg(i) for i in range(_N_ANN))}
    ),
    tallies AS (
      SELECT vec_id, vote, CAST(COUNT(*) AS BIGINT) AS r
      FROM votes GROUP BY vec_id, vote
    ),
    folds AS (
      SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n,
             CAST(SUM(r * (r - 1)) AS BIGINT) AS a
      FROM tallies
    ),
    cat AS (
      SELECT CAST(SUM(CAST(tq AS DECIMAL(38,0))
                      * ({_N_ANN} * (SELECT n FROM folds) - tq))
                  AS BIGINT) AS b
      FROM (SELECT vote, CAST(SUM(r) AS BIGINT) AS tq
            FROM tallies GROUP BY vote)
    )
    SELECT n, a, b,
           CAST(3 * CAST(a AS DECIMAL(38,0)) * n * ({_Q_CATS} - 1) - 2 * b
                AS BIGINT) AS ac1_num,
           CAST(2 * (9 * CAST(n AS DECIMAL(38,0)) * n * ({_Q_CATS} - 1) - b)
                AS BIGINT) AS ac1_den,
           CAST(3 * CAST(a AS DECIMAL(38,0)) * n * ({_Q_CATS} - 1) - 2 * b
                AS DOUBLE)
             / CAST(2 * (9 * CAST(n AS DECIMAL(38,0)) * n
                         * ({_Q_CATS} - 1) - b) AS DOUBLE) AS ac1
    FROM folds CROSS JOIN cat
    """,
)
def eval_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 over the shared 3-annotator votes — see module
    docstring for the exact int64 reduction.  Corpus → (item, vote)
    tally → two 1-row folds joined by scalar broadcast; int64 output
    bound n ≤ ~2e5 items documented (DECIMAL(38,0) intermediates
    beyond)."""
    emb = load_table(spark, sf_dir, "embeddings")
    votes = None
    for i in range(_N_ANN):
        leg = emb.select("vec_id", vote_expr(i).alias("vote"))
        votes = leg if votes is None else votes.unionByName(leg)
    tallies = votes.groupBy("vec_id", "vote").agg(
        F.count(F.lit(1)).cast("bigint").alias("r")
    )
    folds = tallies.agg(
        F.countDistinct("vec_id").cast("bigint").alias("n"),
        F.sum(F.col("r") * (F.col("r") - 1)).cast("bigint").alias("a"),
    )
    per_cat = tallies.groupBy("vote").agg(
        F.sum("r").cast("bigint").alias("tq")
    )
    b = (
        per_cat.crossJoin(F.broadcast(folds.select("n")))
        .agg(
            F.sum(
                F.col("tq").cast(_D38)
                * (F.lit(_N_ANN) * F.col("n") - F.col("tq"))
            )
            .cast("bigint")
            .alias("b")
        )
    )
    num = (
        F.lit(3) * F.col("a").cast(_D38) * F.col("n") * (_Q_CATS - 1)
        - 2 * F.col("b")
    )
    den = F.lit(2) * (
        F.lit(9) * F.col("n").cast(_D38) * F.col("n") * (_Q_CATS - 1)
        - F.col("b")
    )
    return folds.crossJoin(F.broadcast(b)).select(
        "n", "a", "b",
        num.cast("bigint").alias("ac1_num"),
        den.cast("bigint").alias("ac1_den"),
        (num.cast("double") / den.cast("double")).alias("ac1"),
    )


@query(
    "feature_gini_impurity",
    oracle="""
    WITH cells AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY source, lang
    ),
    per_source AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_langs,
             CAST(SUM(CAST(c AS DECIMAL(19,0)) * c) AS BIGINT) AS ssq
      FROM cells GROUP BY source
    )
    SELECT source, n, n_langs,
           CAST(CAST(n AS DECIMAL(19,0)) * n - ssq AS BIGINT) AS imp_num,
           CAST(CAST(n AS DECIMAL(19,0)) * n AS BIGINT) AS imp_den,
           CAST(CAST(n AS DECIMAL(19,0)) * n - ssq AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(19,0)) * n AS DOUBLE)
             AS gini_impurity
    FROM per_source
    """,
)
def feature_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini impurity of the language distribution — see
    module docstring.  Corpus → (source, lang) cells → source fold;
    imp_num ≤ n² needs ≤ 3e9 docs per source in int64 (DECIMAL
    intermediates beyond, the HHI bound)."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per_source = cells.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.sum(F.col("c").cast(_D19) * F.col("c")).cast("bigint").alias("ssq"),
    )
    nsq = F.col("n").cast(_D19) * F.col("n")
    return per_source.select(
        "source", "n", "n_langs",
        (nsq - F.col("ssq")).cast("bigint").alias("imp_num"),
        nsq.cast("bigint").alias("imp_den"),
        ((nsq - F.col("ssq")).cast("double") / nsq.cast("double")).alias(
            "gini_impurity"
        ),
    )


@query(
    "events_peak_detect",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    ctx AS (
      SELECT event_type, day, x,
             LAG(x) OVER w AS prev_x, LEAD(x) OVER w AS next_x
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, x, prev_x, next_x
    FROM ctx
    WHERE prev_x IS NOT NULL AND next_x IS NOT NULL
      AND x > prev_x AND x > next_x
    """,
)
def events_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict local maxima of per-type daily counts — see module
    docstring.  Corpus → (type, day) aggregate; the lag/lead window
    runs over the tiny daily frame (|types|·|days| rows), edges
    excluded (no neighbor ⇒ not a peak), pure integer comparisons."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    ctx = daily.select(
        "event_type", "day", "x",
        F.lag("x").over(w).alias("prev_x"),
        F.lead("x").over(w).alias("next_x"),
    )
    return ctx.where(
        F.col("prev_x").isNotNull()
        & F.col("next_x").isNotNull()
        & (F.col("x") > F.col("prev_x"))
        & (F.col("x") > F.col("next_x"))
    )

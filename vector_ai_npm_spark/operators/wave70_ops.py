"""Wave 70: BLEU clipped-precision components + SCC condensation DAG.

* `eval_bleu_components` — the MT-eval member of the pair-verification
  family (ROUGE-2 gave the bigram multiset view; BLEU, Papineni 2002,
  adds CLIPPED n-gram precision at n = 1..2 and the brevity components):
  for every banded-LSH candidate pair, overlap_n = Σ_g min(m_cand(g),
  m_ref(g)) over n-gram TYPES, precision_n = overlap_n / cand_len_n,
  plus candidate/reference token lengths for the brevity penalty.  The
  face emits the exact INTEGER components and single-division ratios —
  the repo's cross-engine convention (eval_kendall_tau's sqrt-bearing
  denominator, the survival fold) keeps transcendentals (BLEU's
  exp/geometric mean) out of the hash while pinning every number the
  final score is computed from.

* `graph_condensation` — the product SCC decomposition exists for:
  contract every edge to its (scc(src), scc(dst)) pair, drop
  self-pairs, and you get the condensation DAG that scheduling /
  reachability / cycle-debt analyses run on.  Per-SCC row: member
  count, condensation in/out degree, root/leaf flags.  On the planted
  cycle-group fixture the condensation is the group chain g → g+1,
  g → g+2, so every degree is closed-form — a wrong contraction
  (self-pair kept, duplicate condensation edge, SCC split upstream)
  moves a degree.

Scale shapes: BLEU rides the output-bound LSH candidate frame with
per-doc n-gram TYPE counts joined per side (the rouge discipline);
condensation adds two scc-keyed joins + one distinct over edges on top
of scc_colored's equi-join rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark.text.queries import _DUCK_TOKS, _SPARK_TOKS
from vector_ai_npm_spark.text.rouge import _O_PAIRS


def _spark_ngrams(t: DataFrame, n: int) -> DataFrame:
    """(doc_id, gram, m) n-gram TYPE counts, JVM-side."""
    if n == 1:
        g = t.select("doc_id", F.explode("toks").alias("gram"))
    else:
        assert n == 2, "only 1- and 2-grams emitted (see module docstring)"
        g = t.select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with("
                    "slice(toks, 1, greatest(size(toks) - 1, 0)), "
                    "slice(toks, 2, greatest(size(toks) - 1, 0)), "
                    "(a, b) -> concat(a, ' ', b))"
                )
            ).alias("gram"),
        )
    return g.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )


@query(
    "eval_bleu_components",
    oracle=f"""
    WITH {_O_PAIRS},
    t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    u1 AS (SELECT doc_id, unnest(toks) AS gram FROM t),
    c1 AS MATERIALIZED (
      SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS m
      FROM u1 GROUP BY ALL),
    u2 AS (SELECT doc_id, toks[r.i] || ' ' || toks[r.i + 1] AS gram
           FROM t CROSS JOIN UNNEST(range(1, len(toks))) AS r(i)),
    c2 AS MATERIALIZED (
      SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS m
      FROM u2 GROUP BY ALL),
    lens AS MATERIALIZED (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok FROM t),
    ov1 AS (
      SELECT p.doc_id_a, p.doc_id_b,
             CAST(SUM(LEAST(a.m, b.m)) AS BIGINT) AS ov
      FROM pairs p
      JOIN c1 a ON a.doc_id = p.doc_id_a
      JOIN c1 b ON b.doc_id = p.doc_id_b AND a.gram = b.gram
      GROUP BY 1, 2),
    ov2 AS (
      SELECT p.doc_id_a, p.doc_id_b,
             CAST(SUM(LEAST(a.m, b.m)) AS BIGINT) AS ov
      FROM pairs p
      JOIN c2 a ON a.doc_id = p.doc_id_a
      JOIN c2 b ON b.doc_id = p.doc_id_b AND a.gram = b.gram
      GROUP BY 1, 2)
    SELECT p.doc_id_a, p.doc_id_b,
           la.n_tok AS cand_len, lb.n_tok AS ref_len,
           COALESCE(ov1.ov, 0) AS overlap_1,
           COALESCE(ov2.ov, 0) AS overlap_2,
           CAST(COALESCE(ov1.ov, 0) AS DOUBLE)
             / CAST(NULLIF(la.n_tok, 0) AS DOUBLE) AS p1,
           CAST(COALESCE(ov2.ov, 0) AS DOUBLE)
             / CAST(NULLIF(la.n_tok - 1, 0) AS DOUBLE) AS p2,
           la.n_tok >= lb.n_tok AS no_brevity_penalty
    FROM pairs p
    JOIN lens la ON la.doc_id = p.doc_id_a
    JOIN lens lb ON lb.doc_id = p.doc_id_b
    LEFT JOIN ov1 ON ov1.doc_id_a = p.doc_id_a AND ov1.doc_id_b = p.doc_id_b
    LEFT JOIN ov2 ON ov2.doc_id_a = p.doc_id_a AND ov2.doc_id_b = p.doc_id_b
    """,
)
def eval_bleu_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-1/2 clipped components per candidate pair — see module
    docstring.  doc_a plays candidate, doc_b reference."""
    from vector_ai_npm_spark.dedup.queries import dedup_minhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_minhash_pairs(spark, sf_dir).localCheckpoint(eager=True)
    t = docs.select("doc_id", F.expr(_SPARK_TOKS).alias("toks"))
    lens = t.select(
        "doc_id", F.size("toks").cast("bigint").alias("n_tok")
    ).localCheckpoint(eager=True)

    out = pairs
    for n, col in ((1, "overlap_1"), (2, "overlap_2")):
        cn = _spark_ngrams(t, n)
        ov = (
            pairs.join(
                cn.select(
                    F.col("doc_id").alias("doc_id_a"), "gram",
                    F.col("m").alias("ma"),
                ),
                "doc_id_a",
            )
            .join(
                cn.select(
                    F.col("doc_id").alias("doc_id_b"), "gram",
                    F.col("m").alias("mb"),
                ),
                ["doc_id_b", "gram"],
            )
            .groupBy("doc_id_a", "doc_id_b")
            .agg(F.sum(F.least("ma", "mb")).cast("bigint").alias(col))
        )
        out = out.join(ov, ["doc_id_a", "doc_id_b"], "left")

    la = lens.select(
        F.col("doc_id").alias("doc_id_a"), F.col("n_tok").alias("cand_len")
    )
    lb = lens.select(
        F.col("doc_id").alias("doc_id_b"), F.col("n_tok").alias("ref_len")
    )
    return (
        out.join(la, "doc_id_a")
        .join(lb, "doc_id_b")
        .select(
            "doc_id_a", "doc_id_b", "cand_len", "ref_len",
            F.coalesce("overlap_1", F.lit(0)).alias("overlap_1"),
            F.coalesce("overlap_2", F.lit(0)).alias("overlap_2"),
            (
                F.coalesce("overlap_1", F.lit(0)).cast("double")
                / F.nullif(F.col("cand_len"), F.lit(0)).cast("double")
            ).alias("p1"),
            (
                F.coalesce("overlap_2", F.lit(0)).cast("double")
                / F.nullif(F.col("cand_len") - 1, F.lit(0)).cast("double")
            ).alias("p2"),
            (F.col("cand_len") >= F.col("ref_len")).alias(
                "no_brevity_penalty"
            ),
        )
    )


@query(
    "graph_condensation",
    oracle="""
    WITH tot AS (SELECT COUNT(*) AS n FROM customer),
    full_groups AS (
      SELECT (SELECT n FROM tot) - (SELECT n FROM tot) % 10 AS fg
    ),
    sccs AS (
      SELECT DISTINCT CASE WHEN c_custkey < (SELECT fg FROM full_groups)
                           THEN c_custkey - c_custkey % 10
                           ELSE c_custkey END AS scc_id,
             CASE WHEN c_custkey < (SELECT fg FROM full_groups)
                  THEN 10 ELSE 1 END AS scc_size
      FROM customer
    ),
    g AS (SELECT scc_id, scc_size,
                 scc_id // 10 AS gi,
                 (SELECT fg FROM full_groups) // 10 AS ng,
                 (SELECT n FROM tot) AS n
          FROM sccs)
    SELECT scc_id,
           CAST(scc_size AS BIGINT) AS scc_size,
           -- full groups: out to g+1/g+2 where those are full; tail
           -- singletons: out to the next tail node (the in-group path)
           CAST(CASE WHEN scc_size = 10 THEN
                  (CASE WHEN gi + 1 < ng THEN 1 ELSE 0 END)
                + (CASE WHEN gi + 2 < ng THEN 1 ELSE 0 END)
                ELSE (CASE WHEN scc_id + 1 < n THEN 1 ELSE 0 END)
                END AS BIGINT) AS out_deg,
           CAST(CASE WHEN scc_size = 10 THEN
                  (CASE WHEN gi >= 1 THEN 1 ELSE 0 END)
                + (CASE WHEN gi >= 2 THEN 1 ELSE 0 END)
                ELSE (CASE WHEN scc_id % 10 > 0 THEN 1 ELSE 0 END)
                END AS BIGINT) AS in_deg
    FROM g
    """,
)
def graph_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condensation DAG of the wave-68 fixture — see module docstring.
    Tail singletons keep their in-group path edges (r → r+1), so their
    degrees follow the path rule; chords are guarded to FULL-group
    targets so the condensation between full groups stays the clean
    g → g+1 / g → g+2 chain and tail nodes never receive chords."""
    from vector_ai_npm_spark.operators.wave68_ops import scc_colored

    # the wave-68 fixture's cycle edges, chords guarded to full groups
    cust = load_table(spark, sf_dir, "customer")
    ranked = cust.select(F.col("c_custkey").alias("r"))
    n = ranked.count()
    fg = n - n % 10
    nodes = ranked.select(F.col("r").alias("node_id"))
    grp = F.col("r") - F.col("r") % 10
    cycle = ranked.select(
        F.col("r").alias("src"),
        (grp + (F.col("r") % 10 + 1) % 10).alias("dst"),
    )
    chord1 = ranked.where((F.col("r") % 10 == 3) & (F.col("r") + 10 < fg)).select(
        F.col("r").alias("src"), (F.col("r") + 10).alias("dst")
    )
    chord2 = ranked.where((F.col("r") % 10 == 7) & (F.col("r") + 20 < fg)).select(
        F.col("r").alias("src"), (F.col("r") + 20).alias("dst")
    )
    edges = cycle.unionByName(chord1).unionByName(chord2)
    scc = scc_colored(nodes, edges).localCheckpoint(eager=True)

    live = edges.join(
        scc.select(F.col("node_id").alias("src"), F.col("scc_id").alias("sa")),
        "src",
    ).join(
        scc.select(F.col("node_id").alias("dst"), F.col("scc_id").alias("sb")),
        "dst",
    )
    cond = (
        live.where(F.col("sa") != F.col("sb"))
        .select("sa", "sb")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = scc.groupBy("scc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("scc_size")
    )
    outd = cond.groupBy(F.col("sa").alias("scc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("out_deg")
    )
    ind = cond.groupBy(F.col("sb").alias("scc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("in_deg")
    )
    return (
        sizes.join(outd, "scc_id", "left")
        .join(ind, "scc_id", "left")
        .select(
            "scc_id",
            "scc_size",
            F.coalesce("out_deg", F.lit(0)).cast("bigint").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("bigint").alias("in_deg"),
        )
    )

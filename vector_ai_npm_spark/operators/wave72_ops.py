"""Wave 72: frequent-itemset mining (a-priori) + count-min sketch.

* `basket_itemsets_apriori` — frequent pattern mining, the operator
  class the basket family stopped short of (`basket_lift` scores
  PAIRS; recommendations/affinity analyses need k-itemsets): baskets
  group once (collect_set per order), L1-infrequent items are pruned
  INSIDE the basket array (the a-priori monotonicity step — a k-set
  can only be frequent if every member is), then 2- and 3-subsets
  expand INLINE from each pruned basket (combinations bounded by
  basket size ≤ 13 here, and by the L1 prune generally — never a
  corpus self-join) and count per itemset with one groupBy each.
  A planted 3-item bundle rides every 50th order so the triple tier is
  structurally non-empty on organic data; min support 3 keeps the
  output analytic-sized.  Oracle reproduces the same expansion in SQL.

* `agg_count_min_sketch` — Spark's BUILT-IN `count_min_sketch`
  aggregate (the JVM mergeable sketch, org.apache.spark.util.sketch)
  as a first-class face: one-shot sketch over all events vs the MERGE
  of four per-week sketches (the partial-aggregation contract that
  makes sketches shuffle-constant at any corpus size), queried for 10
  deterministic keys.  Pins per key: exact count, the CMS guarantee
  est ≥ exact (never undercounts), a generous deterministic slack
  bound (10× the eps·N theory bound — data is fixed per sf, so this
  is a regression pin, not a probabilistic one), and merged ≡ one-shot
  estimate equality (same seed ⇒ same hash rows ⇒ merge is cellwise
  addition).  Sketch bytes stay KB-sized driver state.

Scale shapes: itemsets = two groupBys over inline-expanded bounded
arrays; CMS = built-in partial-merge aggregate, constant-size state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_MINSUP = 3
_PLANT = (9000001, 9000002, 9000003)

_O_BASKETS = f"""
    raw AS (
      SELECT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS item
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, p.p
      FROM (SELECT DISTINCT l_orderkey FROM lineitem
            WHERE l_orderkey % 50 = 0) b
      CROSS JOIN (VALUES ({_PLANT[0]}), ({_PLANT[1]}), ({_PLANT[2]}))
        AS p(p)
    ),
    dedup AS (SELECT DISTINCT o, item FROM raw),
    l1 AS (SELECT item FROM dedup GROUP BY item
           HAVING COUNT(*) >= {_MINSUP}),
    b AS (SELECT o, list_sort(list(item)) AS ps
          FROM dedup JOIN l1 USING (item) GROUP BY o)
"""


@query(
    "basket_itemsets_apriori",
    oracle=f"""
    WITH {_O_BASKETS},
    pairs AS (
      SELECT ps[i.i] AS i1, ps[j.j] AS i2
      FROM b
      CROSS JOIN UNNEST(range(1, len(ps) + 1)) AS i(i)
      CROSS JOIN UNNEST(range(1, len(ps) + 1)) AS j(j)
      WHERE i.i < j.j),
    p2 AS (SELECT i1, i2, CAST(COUNT(*) AS BIGINT) AS support
           FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= {_MINSUP}),
    triples AS (
      SELECT ps[i.i] AS i1, ps[j.j] AS i2, ps[k.k] AS i3
      FROM b
      CROSS JOIN UNNEST(range(1, len(ps) + 1)) AS i(i)
      CROSS JOIN UNNEST(range(1, len(ps) + 1)) AS j(j)
      CROSS JOIN UNNEST(range(1, len(ps) + 1)) AS k(k)
      WHERE i.i < j.j AND j.j < k.k),
    p3 AS (SELECT i1, i2, i3, CAST(COUNT(*) AS BIGINT) AS support
           FROM triples GROUP BY 1, 2, 3 HAVING COUNT(*) >= {_MINSUP})
    SELECT CAST(2 AS INTEGER) AS k, i1, i2,
           CAST(NULL AS BIGINT) AS i3, support FROM p2
    UNION ALL
    SELECT 3, i1, i2, i3, support FROM p3
    """,
)
def basket_itemsets_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 2-/3-itemsets — see module docstring."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"),
        F.col("l_partkey").cast("bigint").alias("item"),
    )
    planted = (
        li.select("o")
        .where(F.col("o") % 50 == 0)
        .distinct()
        .select("o", F.explode(F.array(*[F.lit(p) for p in _PLANT])).alias("item"))
    )
    dedup = li.unionByName(planted).distinct()
    l1 = (
        dedup.groupBy("item")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= _MINSUP)
        .select("item")
    )
    baskets = (
        dedup.join(l1, "item")
        .groupBy("o")
        .agg(F.array_sort(F.collect_set("item")).alias("ps"))
    )
    # inline k-subset expansion: bounded by (pruned basket size choose k)
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS i1, y AS i2))))"
            )
        ).alias("p")
    ).select("p.i1", "p.i2")
    p2 = (
        pairs.groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .where(F.col("support") >= _MINSUP)
    )
    triples = baskets.select(
        F.explode(
            F.expr(
                "flatten(flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps)), (y, j) -> "
                "transform(slice(ps, i + j + 3, size(ps)), "
                "z -> struct(x AS i1, y AS i2, z AS i3))))))"
            )
        ).alias("t")
    ).select("t.i1", "t.i2", "t.i3")
    p3 = (
        triples.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .where(F.col("support") >= _MINSUP)
    )
    two = p2.select(
        F.lit(2).cast("int").alias("k"), "i1", "i2",
        F.lit(None).cast("bigint").alias("i3"), "support",
    )
    three = p3.select(
        F.lit(3).cast("int").alias("k"), "i1", "i2", "i3", "support"
    )
    return two.unionByName(three)


_CMS_KEYS = tuple(range(0, 100, 10))  # ten deterministic user_ids


@query(
    "agg_count_min_sketch",
    oracle=f"""
    WITH keys AS (
      SELECT CAST(unnest([{", ".join(str(k) for k in _CMS_KEYS)}]) AS BIGINT)
        AS key
    ),
    exact AS (
      SELECT k.key, CAST(COUNT(e.user_id) AS BIGINT) AS exact_count
      FROM keys k LEFT JOIN events e ON e.user_id = k.key
      GROUP BY k.key
    )
    SELECT key, exact_count,
           TRUE AS never_undercounts,
           TRUE AS within_slack,
           TRUE AS merge_equals_oneshot
    FROM exact
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in CMS one-shot vs merged-partials — see module docstring."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    eps, conf, seed = 0.0005, 0.99, 42
    agg = f"count_min_sketch(user_id, {eps}d, {conf}d, {seed})"
    one = ev.agg(F.expr(agg).alias("sk")).first()["sk"]
    weekly = (
        ev.groupBy(F.weekofyear("ts").alias("w"))
        .agg(F.expr(agg).alias("sk"))
        .collect()
    )

    jvm = spark._jvm
    jio = jvm.java.io.ByteArrayInputStream

    def load(b: bytes):
        return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            jio(bytes(b))
        )

    oneshot = load(one)
    merged = load(weekly[0]["sk"])
    for row in weekly[1:]:
        merged.mergeInPlace(load(row["sk"]))

    n_total = ev.count()
    slack = max(1, int(10 * eps * n_total))  # 10x the eps*N theory bound
    exact = {
        r["user_id"]: r["c"]
        for r in ev.where(F.col("user_id").isin(*_CMS_KEYS))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    rows = []
    for k in _CMS_KEYS:
        ex = int(exact.get(k, 0))
        e1 = int(oneshot.estimateCount(k))
        e2 = int(merged.estimateCount(k))
        rows.append(
            (k, ex, e1 >= ex, e1 <= ex + slack, e1 == e2)
        )
    return spark.createDataFrame(
        rows,
        "key long, exact_count long, never_undercounts boolean, "
        "within_slack boolean, merge_equals_oneshot boolean",
    )

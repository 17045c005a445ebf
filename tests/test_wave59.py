"""Wave 59: entity-resolution pipeline invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_er_variants_recluster_to_their_customer(spark):
    """Every synthesized variant mention must land in its customer's
    cluster (recall through the transitive hub edge), and no cluster
    may span two customers (precision from md5 entropy)."""
    from vector_ai_npm_spark.operators.wave59_ops import er_cluster_mentions

    rows = er_cluster_mentions(spark, SF).collect()
    by_mention = {r.mention_id: r.entity_id for r in rows}
    custs = {m // 4 for m in by_mention}
    for m, e in by_mention.items():
        # entity id maps back to the same customer for every variant
        assert e // 4 == m // 4, (m, e)
    # cluster sizes: 1 (base only) / 2 / 3 depending on custkey mod 2,3
    from collections import Counter

    sizes = Counter()
    for m, e in by_mention.items():
        sizes[e] += 1
    for e, n in sizes.items():
        ck = e // 4
        want = 1 + (ck % 2 == 0) + (ck % 3 == 0)
        assert n == want, (ck, n, want)
    assert len(custs) > 0


def test_er_canonical_is_min_id_per_cluster(spark):
    from vector_ai_npm_spark.operators.wave59_ops import er_cluster_mentions

    df = er_cluster_mentions(spark, SF)
    agg = df.groupBy("entity_id").agg(
        F.min("mention_id").alias("mn"),
        F.sum(F.when(F.col("is_canonical"), 1).otherwise(0)).alias("nc"),
    )
    bad = agg.where((F.col("mn") != F.col("entity_id")) | (F.col("nc") != 1))
    assert bad.count() == 0


def test_er_pairs_never_cross_blocks(spark):
    """The blocking contract: the pair join is keyed on the block, so
    its plan is an equi-join (never a cartesian over mentions)."""
    from vector_ai_npm_spark.operators.wave59_ops import er_cluster_mentions

    plan = (
        er_cluster_mentions(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan

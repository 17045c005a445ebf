#!/usr/bin/env python
"""Hub study: measure what `_PIVOT_CAP` buys on a hub-poisoned graph.

    python tools/hub_study.py [HUB_DEGREE ...]

Plants one synthetic super-hub into the sf0.1 co-purchase edge list
(a node adjacent to HUB_DEGREE existing nodes — the celebrity-node /
stopword-entity shape real link graphs always have), then runs the
link-prediction wedge-join candidate generation twice per degree:

  * capped  — pivots with deg > _PIVOT_CAP skipped (the shipped path)
  * uncapped — cap lifted (what a naive implementation does)

and prints wall time + wedge-candidate count for each.  The uncapped
wedge cost through the hub alone is C(HUB_DEGREE, 2); the capped run
must stay flat because the hub pivot drops out entirely.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = "/root/testdata/sf0.1"
DEGREES = [int(a) for a in sys.argv[1:]] or [1000, 3000]


def candidates(edges, cap: int):
    from pyspark.sql import functions as F

    sym = edges.select(
        F.col("src").alias("node"), F.col("dst").alias("nbr")
    ).unionAll(
        edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    pivots = (
        sym.join(deg, "node")
        .where(F.col("deg") <= cap)
        .select(F.col("node").alias("pivot"), "nbr")
    )
    a, b = pivots.alias("a"), pivots.alias("b")
    return (
        a.join(
            b,
            (F.col("a.pivot") == F.col("b.pivot"))
            & (F.col("a.nbr") < F.col("b.nbr")),
        )
        .groupBy(F.col("a.nbr"), F.col("b.nbr"))
        .agg(F.count(F.lit(1)).alias("common"))
    )


def main() -> None:
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.operators.graph_ops import copurchase_edges
    from vector_ai_npm_spark.operators.linkpred_ops import _PIVOT_CAP
    from vector_ai_npm_spark.session import get_spark

    spark = get_spark("hub-study")
    base = copurchase_edges(spark, SF).select("src", "dst")
    base = base.localCheckpoint()  # freeze: the study times the wedge join
    nodes = [r[0] for r in base.select("src").distinct().limit(5000).collect()]
    hub_id = 10**9
    print(f"{'hub_deg':>8s} {'mode':>9s} {'wall_s':>8s} {'cand_pairs':>11s}")
    for d in DEGREES:
        hub_edges = spark.createDataFrame(
            [(min(n, hub_id), max(n, hub_id)) for n in nodes[:d]],
            "src long, dst long",
        )
        g = base.unionByName(hub_edges).localCheckpoint()
        for mode, cap in (("capped", _PIVOT_CAP), ("uncapped", 1 << 40)):
            t0 = time.perf_counter()
            n = candidates(g, cap).count()
            wall = time.perf_counter() - t0
            print(f"{d:8d} {mode:>9s} {wall:8.2f} {n:11d}")
    spark.stop()


if __name__ == "__main__":
    main()

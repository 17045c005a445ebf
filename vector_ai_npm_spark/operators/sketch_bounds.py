"""Percentile-sketch error-bound contract (wave 12).

Exact distributed percentiles (`agg_percentile_dist`,
`agg_histogram_equidepth`) cost a keyed shuffle of every value; at
100 TB the production route is a MERGEABLE quantile sketch —
Spark's `approx_percentile` (Greenwald-Khanna variant) folds
constant-size state map-side exactly like the HLL/theta sketches in
`agg_sketch_distinct`.  What a sketch owes you is not the exact value
but a RANK guARANTEE: with accuracy parameter a, the returned value's
true rank is within n/a of the target rank.

`agg_approx_percentile_bounds` makes that guarantee a driver-checkable
contract (the curate_compression_ratio pattern): per event_type it asks
the sketch for p50 at accuracy {_ACC}, then measures the returned
value's TRUE rank with one exact pass, and emits the boolean
|rank − n/2| ≤ n/{_ACC} + 1.  The sketch value itself is engine-
specific (DuckDB has no GK sketch) so it never appears in the output —
only n and the bound booleans, which the oracle pins exactly.

Scale: the sketch aggregate is one map-side-combined pass with
O(a·log n) state per group; the rank audit joins a |groups|-row
broadcast back over one more scan.  (The audit is the TEST harness —
production runs only the sketch pass.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_ACC = 200  # GK accuracy: true rank within n/200 of target


@query(
    "agg_approx_percentile_bounds",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_rank_ok,
           TRUE AS p90_rank_ok
    FROM events GROUP BY event_type
    """,
)
def agg_approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-exact rank audit for p50 and p90 — see module
    docstring.  A sketch regression (bad merge, dropped compactor,
    wrong rank math) flips a boolean → red driver row."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    sk = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"approx_percentile(value, 0.5, {_ACC})").alias("a50"),
        F.expr(f"approx_percentile(value, 0.9, {_ACC})").alias("a90"),
    )
    # The GK guarantee is on SOME rank of the returned ELEMENT, whose
    # ranks form the interval [#{v < a}+1, #{v <= a}] when values tie.
    # Auditing only the max-rank (#{v <= a}) would spuriously fail a
    # correct sketch whenever >= n/ACC rows share the returned value
    # (e.g. a zero/default spike), so the audit checks that the
    # element's rank INTERVAL intersects [n·q − n/ACC, n·q + n/ACC].
    audited = (
        ev.join(F.broadcast(sk), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.sum(
                F.when(F.col("value") < F.col("a50"), 1).otherwise(0)
            ).alias("lt50"),
            F.sum(
                F.when(F.col("value") <= F.col("a50"), 1).otherwise(0)
            ).alias("le50"),
            F.sum(
                F.when(F.col("value") < F.col("a90"), 1).otherwise(0)
            ).alias("lt90"),
            F.sum(
                F.when(F.col("value") <= F.col("a90"), 1).otherwise(0)
            ).alias("le90"),
        )
    )
    tol = F.col("n") / F.lit(_ACC) + F.lit(1.0)

    def interval_ok(lt, le, q):
        target = F.col("n") * F.lit(q)
        return (F.col(lt) + F.lit(1) <= target + tol) & (
            F.col(le) >= target - tol
        )

    return audited.select(
        "event_type",
        "n",
        interval_ok("lt50", "le50", 0.5).alias("p50_rank_ok"),
        interval_ok("lt90", "le90", 0.9).alias("p90_rank_ok"),
    )

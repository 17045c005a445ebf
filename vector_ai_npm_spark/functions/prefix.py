"""Two-level bucketed prefix sums — the shared distributed-cumsum
primitive.

A single ``Window.orderBy(...)`` over a corpus-scale frame moves every
row into ONE task (the wall measured in the §4j skew study, and the
shape tests/test_plans.py's unpartitioned-window gate rejects).  The
two-level decomposition computes the identical prefix sum with only
bounded unpartitioned state:

1. bucket the ordering key into contiguous ranges;
2. per-bucket EXCLUSIVE prefix via a window PARTITIONED by bucket
   (distributed — each bucket is a separate task group);
3. per-bucket totals via an aggregate (one row per bucket), carried
   across buckets by the only unpartitioned window — bounded by the
   bucket count, not the row count;
4. broadcast the carries back: cum_before = prior_buckets + within.

The same decomposition backs streaming/windows.py::late_events (prefix
max), analytics_ops._ntile_two_level (quantile binning), and the
drift/pareto/ppl cumulative readouts; this module is the extracted
sum form used by the rank-statistics family (eval_auc_rank,
feature_rank_normalize), property-tested against a naive global
cumsum in tests/test_prefix_properties.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def cum_before(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    bucket_width: int,
    out_col: str = "cum_before",
) -> DataFrame:
    """Exclusive prefix sum of ``weight_col`` over ``order_col`` order.

    Adds ``out_col`` = sum of ``weight_col`` across all rows with a
    strictly smaller ``order_col`` (rows must be unique per
    ``order_col`` — aggregate first, as the rank-statistics callers
    do).  Never windows an unbounded frame: the only unpartitioned
    window runs over the per-bucket aggregate (rows / bucket_width
    key-range buckets)."""
    bucket: Column = (F.col(order_col) / F.lit(bucket_width)).cast("long")
    b = df.withColumn("__bucket", bucket)
    w_in = (
        W.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    within = b.withColumn(
        "__within", F.coalesce(F.sum(weight_col).over(w_in), F.lit(0))
    )
    btot = b.groupBy("__bucket").agg(F.sum(weight_col).alias("__bucket_n"))
    w_carry = W.orderBy("__bucket").rowsBetween(W.unboundedPreceding, -1)
    carries = btot.select(
        "__bucket",
        F.coalesce(F.sum("__bucket_n").over(w_carry), F.lit(0)).alias(
            "__prior"
        ),
    )
    return (
        within.join(F.broadcast(carries), "__bucket")
        .withColumn(out_col, F.col("__prior") + F.col("__within"))
        .drop("__bucket", "__within", "__prior")
    )

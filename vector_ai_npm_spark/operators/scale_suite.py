"""Scale-first operators: mergeable sketches + clustered data layout.

These are the pieces that only start to matter past ~1 TB, where exact
global state stops fitting and scan pruning dominates cost:

* **Mergeable sketches** (Apache DataSketches, built into Spark ≥3.5):
  HLL / theta for distinct counts, KLL for quantiles. Unlike plain
  ``approx_count_distinct`` (whose HLL++ state is query-internal), these
  expose the sketch as a *column* — partials can be persisted per
  partition/day, unioned later, and still produce the same estimate as a
  full-data pass. That is the only architecture that lets a 100 TB
  pipeline maintain rolling distinct-user / latency-percentile metrics
  without rescanning history: the daily job sketches one day, the
  reporting query merges 365 sketch rows.

* **Range-clustered layout**: write-side ``repartitionByRange`` +
  ``sortWithinPartitions`` so every parquet file owns a tight, disjoint
  key range. Readers with a range predicate then skip whole files /
  row-groups via footer min-max stats — the poor man's Z-order, and the
  single highest-leverage knob for time-series scans at scale.

Reference context: the reference (AnonJon/vector-ai-npm) keeps all its
state in Postgres (vector-client.ts:293-313) where exact DISTINCT / sort
is cheap at its scale; these operators are the Spark-native replacements
once the store is parquet measured in terabytes.

Raw estimates have no DuckDB twin (sketch internals differ by engine),
so the estimate-bearing queries emit CONTRACT faces instead: the exact
side (hash-matchable) beside booleans pinning each estimate inside its
documented error bound, with TRUE mirrored in the oracle — drift beyond
the guarantee becomes a red driver row. The raw-estimate accuracy and
merge-consistency pins live in tests/test_scale_suite.py. The layout
query IS value-oracle-checked: re-laying-out data must never change
query results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

# lgConfigK=14 → 16 KiB registers per sketch, ~0.8% relative standard
# error — the DataSketches-recommended default for production metrics.
_HLL_LGK = 14


@query(
    "agg_sketch_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS hll_ok,
           TRUE AS theta_ok
    FROM events GROUP BY event_type
    """,
)
def agg_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type, three ways: exact, HLL, theta.

    The raw estimates have no DuckDB twin (sketch internals differ by
    engine), so the driver-checkable face pins the CONTRACT: the exact
    count (hash-matchable) beside one boolean per sketch asserting
    |est − exact| ≤ 2%·exact (HLL lgK=14 ⇒ ~0.8% RSE; 2% ≈ 2.5σ). The
    oracle mirrors the exact side and TRUE per bound — estimate drift
    beyond the guarantee turns into a red driver row. At 100 TB you'd
    drop the exact column and keep the sketches: both aggregate map-side
    into constant-size state, so the shuffle carries O(groups × 16 KiB)
    regardless of row count — vs count_distinct's O(distinct values)
    exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", _HLL_LGK)).alias(
            "hll_users"
        ),
        F.theta_sketch_estimate(F.theta_sketch_agg("user_id")).alias("theta_users"),
    )
    tol = F.lit(0.02) * F.col("exact_users")
    return sk.select(
        "event_type",
        "exact_users",
        (F.abs(F.col("hll_users") - F.col("exact_users")) <= tol).alias("hll_ok"),
        (F.abs(F.col("theta_users") - F.col("exact_users")) <= tol).alias(
            "theta_ok"
        ),
    )


@query(
    "agg_sketch_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days_merged,
           TRUE AS merge_lossless
    FROM events GROUP BY event_type
    """,
)
def agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeability contract: union-of-daily-partials ≡ full pass.

    Builds one HLL sketch per (event_type, day), merges the partials with
    ``hll_union_agg``, and joins against the single-pass sketch. HLL
    union is register-wise max, so ``merged_users == direct_users``
    EXACTLY (same lgK) — emitted as the ``merge_lossless`` boolean the
    oracle pins to TRUE (beside the hash-matchable day count). This is
    the incremental-metrics pattern: persist the daily sketch column,
    never rescan history.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", _HLL_LGK).alias("day_sketch")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("day_sketch")).alias("merged_users"),
        F.count(F.lit(1)).alias("days_merged"),
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", _HLL_LGK)).alias(
            "direct_users"
        )
    )
    return merged.join(direct, "event_type").select(
        "event_type",
        "days_merged",
        (F.col("merged_users") == F.col("direct_users")).alias("merge_lossless"),
    )


@query(
    "agg_kll_quantiles",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles: KLL sketch of l_extendedprice per returnflag.

    Complements the exact/approx percentile family (agg_percentile*):
    exact quantiles need a sort or cumulative-count pass; KLL is a
    single-pass constant-memory aggregate whose state merges across
    partitions AND across incremental batches, with a proven rank-error
    bound (~1.65% at the default k=200, 99% confidence). The right
    default for 100 TB latency dashboards.

    Driver face mirrors agg_approx_percentile's contract shape: the KLL
    values themselves differ by engine, so emit one boolean per rank
    asserting the estimate lies inside the exact discrete-quantile band
    at q ± 3% (the rank-error bound plus margin for disc's ceil
    rounding; the local pytest pins a tighter 2.5% on the measured
    rank). The oracle pins the group count and TRUE per band.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wg = "WITHIN GROUP (ORDER BY l_extendedprice)"
    ranks = [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
    aggs = [
        F.kll_sketch_agg_double("l_extendedprice").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    ]
    for q, nm in ranks:
        lo, hi = max(0.0, q - 0.03), min(1.0, q + 0.03)
        aggs += [
            F.expr(f"percentile_disc({lo}) {wg}").alias(f"_lo_{nm}"),
            F.expr(f"percentile_disc({hi}) {wg}").alias(f"_hi_{nm}"),
        ]
    sk = li.groupBy("l_returnflag").agg(*aggs)
    cols = ["l_returnflag", "n"]
    for q, nm in ranks:
        est = F.kll_sketch_get_quantile_double("sk", F.lit(q))
        cols.append(
            ((F.col(f"_lo_{nm}") <= est) & (est <= F.col(f"_hi_{nm}"))).alias(
                f"{nm}_ok"
            )
        )
    return sk.select(*cols)


# Number of range buckets for the clustered layout. At 100 TB this would
# be sized so each file lands near the rowgroup/file sweet spot
# (~128 MB–1 GB); 16 keeps the fixture files non-trivial but plural.
_CLUSTER_BUCKETS = 16


def cluster_by_range(
    df: DataFrame, path: str, keys: list[str], buckets: int = _CLUSTER_BUCKETS
) -> None:
    """Write ``df`` range-clustered on ``keys``: global range partition,
    then an in-partition sort, so each output file owns a tight disjoint
    key range and parquet min-max stats become an effective index."""
    (
        df.repartitionByRange(buckets, *keys)
        .sortWithinPartitions(*keys)
        .write.mode("overwrite")
        .parquet(path)
    )


@query(
    "layout_cluster_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def layout_cluster_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered rewrite of lineitem on l_shipdate, then a
    one-month scan over the clustered copy.

    The oracle runs the SAME filter on the ORIGINAL table — the layout
    operator's correctness contract is "rewrites never change results".
    The efficiency contract (files outside the month are skipped via
    footer min-max, ~1/16 of data read) is pinned in
    tests/test_scale_suite.py by inspecting the parquet footers.

    Plan: write side is one range-exchange (sampling pass + shuffle);
    read side is a plain scan whose PushedFilters prune at three levels —
    file (min-max), row-group (statistics), page (column index).
    """
    import hashlib
    import os
    import tempfile

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity", "l_extendedprice"
    )
    # Stable per-sf_dir path + rewrite-once: repeated bench/test runs
    # reuse the clustered copy instead of leaking a fresh mkdtemp each
    # invocation (the copy is deterministic for a given input dir).
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_layout_{tag}", "lineitem_by_shipdate"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        cluster_by_range(li, path, ["l_shipdate", "l_orderkey"])
    return spark.read.parquet(path).where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )


_Z_BITS = 16  # fixture keys fit 16 bits; production interleaves 32 per dim


def zvalue(a: F.Column, b: F.Column, bits: int = _Z_BITS) -> F.Column:
    """Morton z-value: interleave the low ``bits`` of two non-negative
    int keys (a's bit i → position 2i+1, b's → 2i). Pure bitwise
    shift/and/or column arithmetic — whole-stage codegen, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def cluster_by_zorder(
    df: DataFrame,
    path: str,
    key_a: str,
    key_b: str,
    buckets: int = _CLUSTER_BUCKETS,
) -> None:
    """Write ``df`` z-order-clustered on (key_a, key_b): range-partition
    + in-partition sort on the interleaved Morton value, so every output
    file covers a tight RECTANGLE in (key_a, key_b) space and parquet
    min-max footers prune on BOTH dimensions — the multi-column layout
    a single-key range cluster can't give (it bounds one dimension and
    leaves the other's span at full width in every file)."""
    (
        df.withColumn("_z", zvalue(F.col(key_a), F.col(key_b)))
        .repartitionByRange(buckets, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


@query(
    "layout_cluster_zorder",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
    FROM lineitem
    WHERE l_partkey BETWEEN 200 AND 400
      AND l_suppkey BETWEEN 20 AND 40
    """,
)
def layout_cluster_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustered rewrite of lineitem on
    (l_partkey, l_suppkey), then a 2-D box query over the copy.

    Same contract split as `layout_cluster_range`: the oracle runs the
    identical box filter on the ORIGINAL table — layout rewrites never
    change results — while the efficiency contract (each file's footer
    bounds BOTH key dimensions, so a box query skips files on either
    predicate) is pinned in tests/test_scale_suite.py by measuring
    per-file spans: z-order keeps the area-sum of per-file rectangles
    a small fraction of files × full-grid area, where partkey-only
    range clustering leaves every file's suppkey span at full width.

    Plan: the z-value is 2·_Z_BITS bitwise ops in whole-stage codegen
    (no UDF); the write is one range exchange on _z; the read is a
    plain scan with both predicates in PushedFilters. At 100 TB this
    is the DELTA/Iceberg OPTIMIZE ZORDER recipe: pay one clustered
    rewrite, make every multi-dimension selective scan footer-prunable."""
    import hashlib
    import os
    import tempfile

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_layout_{tag}", "lineitem_zorder"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        cluster_by_zorder(li, path, "l_partkey", "l_suppkey")
    return spark.read.parquet(path).where(
        F.col("l_partkey").between(200, 400)
        & F.col("l_suppkey").between(20, 40)
    )


@query(
    "agg_sketch_setops",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(c) AS BIGINT) AS exact_click,
           CAST(SUM(p) AS BIGINT) AS exact_purchase,
           CAST(SUM(c * p) AS BIGINT) AS exact_both,
           CAST(SUM(c * (1 - p)) AS BIGINT) AS exact_click_only,
           CAST(SUM(CASE WHEN c + p > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS exact_either,
           TRUE AS inter_ok, TRUE AS diff_ok, TRUE AS union_ok
    FROM pu
    """,
)
def agg_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA — audience overlap without a join: theta
    sketches support intersection and difference (HLL does only union),
    so "users who clicked AND purchased / clicked but never purchased /
    did either" come from combining two per-segment sketches instead of
    shuffling user sets. This is the 100 TB audience-overlap shape:
    each segment keeps one constant-size sketch per partition, the
    set ops run on merged sketch state, and NO user-id ever crosses
    the wire for the overlap question.

    Driver face follows agg_sketch_distinct's contract shape: exact
    per-user-flag counts (hash-matchable in SQL) beside one boolean
    per set op pinning |est − exact| ≤ 5%·exact (theta intersections
    lose precision vs unions; at fixture scale the sketches are in
    exact mode so the bound is loose)."""
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
    )
    agg = pu.agg(
        F.sum("c").alias("exact_click"),
        F.sum("p").alias("exact_purchase"),
        F.sum(F.col("c") * F.col("p")).alias("exact_both"),
        F.sum(F.col("c") * (1 - F.col("p"))).alias("exact_click_only"),
        F.sum(F.when(F.col("c") + F.col("p") > 0, 1).otherwise(0)).alias(
            "exact_either"
        ),
        F.theta_sketch_agg(F.when(F.col("c") == 1, F.col("user_id"))).alias("skc"),
        F.theta_sketch_agg(F.when(F.col("p") == 1, F.col("user_id"))).alias("skp"),
    )
    est_inter = F.theta_sketch_estimate(
        F.theta_intersection(F.col("skc"), F.col("skp"))
    )
    est_diff = F.theta_sketch_estimate(
        F.theta_difference(F.col("skc"), F.col("skp"))
    )
    est_union = F.theta_sketch_estimate(F.theta_union(F.col("skc"), F.col("skp")))

    def _ok(est, exact):
        # theta set-op error scales with the UNION size, not the result
        # size (standard sketch bound; RSE ≈ 1/√k on the sampled
        # stream): a result-relative bound is statistically wrong for
        # small results — the r11 sf1 sweep caught it on a 3-user
        # difference between two ~15k-user sketches in estimation mode.
        # At fixture scales the sketches are exact and both arms pass.
        return F.abs(est - F.col(exact)) <= F.greatest(
            F.lit(0.05) * F.col(exact),
            F.lit(0.05) * F.col("exact_either"),
        )

    return agg.select(
        F.col("exact_click").cast("long"),
        F.col("exact_purchase").cast("long"),
        F.col("exact_both").cast("long"),
        F.col("exact_click_only").cast("long"),
        F.col("exact_either").cast("long"),
        _ok(est_inter, "exact_both").alias("inter_ok"),
        _ok(est_diff, "exact_click_only").alias("diff_ok"),
        _ok(est_union, "exact_either").alias("union_ok"),
    )

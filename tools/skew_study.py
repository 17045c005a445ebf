#!/usr/bin/env python
"""Hot-key skew study: measure what a skewed key actually costs each
operator shape, and which mitigation engages (TUNING.md §3 playbook,
with numbers instead of folklore).

    python tools/skew_study.py

Builds /tmp/sf0.1_x10_skew — the 10x replica's EVENTS (10M rows) with
30% reassigned to user_id=1 (a 3M-row whale), everything else verbatim
— then times three shapes uniform-vs-skewed. (At 1x the whale fits in
one task's noise floor — measured flat — so the study runs on the 10x
replica where the single-task cost is visible.)

  1. hash AGGREGATE on the hot key (groupBy user): partial aggregation
     (map-side combine) should make the whale nearly free — the
     pre-shuffle combine collapses its rows per task.
  2. shuffle JOIN on the hot key (events ⋈ customer, broadcast disabled
     to force SMJ): AQE's skew-join split is the mitigation — measured
     with it ON vs OFF (thresholds lowered so the tiny fixture
     triggers the same code path a 100 TB whale would).
  3. per-key WINDOW (ordered session numbering): the one shape with no
     engine mitigation — the whale's rows must sit in one task in
     event-time order. This is WHY events_rfm/pareto use two-level
     decompositions instead of per-key global windows where possible.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SRC = "/tmp/sf0.1_x10"  # the 10x replica (tools/scale_study.py builds it)
DST = "/tmp/sf0.1_x10_skew"
HOT_FRACTION = 0.3


def build_skew_replica(spark) -> None:
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.io.sources import load_table

    if not Path(SRC).exists():
        raise SystemExit(f"{SRC} missing - run tools/scale_study.py first")
    if Path(DST).exists():
        print(f"skew replica exists at {DST}")
        return
    ev = load_table(spark, SRC, "events")
    skewed = ev.withColumn(
        "user_id",
        F.when(
            (F.xxhash64("event_id") % 100) < int(HOT_FRACTION * 100), F.lit(1)
        ).otherwise(F.col("user_id")),
    )
    skewed.write.mode("overwrite").parquet(f"{DST}/events.parquet")
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    print(f"wrote skew replica (hot user holds ~{int(HOT_FRACTION*100)}%)")


def _timed(fn) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.session import get_spark

    spark = get_spark("skew-study")
    build_skew_replica(spark)

    def agg_shape(sf):
        ev = load_table(spark, sf, "events")
        ev.groupBy("user_id").agg(
            F.count(F.lit(1)), F.sum("value")
        ).agg(F.count(F.lit(1))).collect()

    def join_shape(sf):
        ev = load_table(spark, sf, "events")
        cust = load_table(spark, sf, "customer")
        ev.join(cust, ev.user_id == cust.c_custkey).agg(
            F.count(F.lit(1)), F.sum("value")
        ).collect()

    def window_shape(sf):
        ev = load_table(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev.withColumn("rn", F.row_number().over(w)).agg(
            F.count(F.lit(1)), F.sum("rn")
        ).collect()

    print(f"{'shape':34s} {'uniform':>8s} {'skewed':>8s} {'ratio':>6s}")

    for fn in (agg_shape,):
        u, s = _timed(lambda: fn(SRC)), _timed(lambda: fn(DST))
        print(f"{'agg (partial-agg mitigated)':34s} {u:8.2f} {s:8.2f} {s/u:6.1f}")

    # force SMJ so the shuffle join actually shuffles the hot key, and
    # lower the AQE skew thresholds so the fixture-size whale triggers
    # the same split path a 100 TB whale would
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    for skew_on in (True, False):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower()
        )
        u, s = _timed(lambda: join_shape(SRC)), _timed(lambda: join_shape(DST))
        label = f"SMJ join (AQE skew-join {'ON' if skew_on else 'OFF'})"
        print(f"{label:34s} {u:8.2f} {s:8.2f} {s/u:6.1f}")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    )
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    for fn in (window_shape,):
        u, s = _timed(lambda: fn(SRC)), _timed(lambda: fn(DST))
        print(f"{'per-key ordered window (no engine fix)':34s} {u:8.2f} {s:8.2f} {s/u:6.1f}")

    spark.stop()


if __name__ == "__main__":
    main()

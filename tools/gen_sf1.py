#!/usr/bin/env python
"""Generate a FRESH sf1 TPC-H-shaped dataset (10× sf0.1 row counts)
and run the 28-query relational core against it once — the third scale
point (sf0.1 → 10× replica → sf1) the round-7 verdict asked for
(item 7).  Unlike tools/scale_study.py's verbatim replicas, every row
here is drawn fresh from the fixture's observed domains, so value
distributions, join fan-outs and date selectivities scale the way a
real 10× corpus would (no copied rows, no planted duplicates).

    python tools/gen_sf1.py            # generate (if absent) + run core
    python tools/gen_sf1.py --gen-only

Generation is Spark-native and deterministic: `spark.range` +
xxhash64-derived draws (seeded by column salt), JVM-only — no Python
UDFs, no driver-side data.  Domains mirror the sf0.1 fixture profile:

  * customer 150k (×10): nation 0..24, acctbal −1000..10000,
    5 mktsegments
  * supplier 10k, part 200k (Brand#1..25, 6 p_types, 8×8 p_names,
    size 1..50, retailprice 900..1000)
  * orders 1.5M: custkey uniform, status O/P/F, orderdate
    1995-01-01..2001-08-01, 5 priorities
  * lineitem ~6M: 1..7 lines/order (mean 4 — the fixture's 4.08),
    qty 1..50, extendedprice 900..105000, discount 0..0.10,
    tax 0..0.08, returnflag A/N/R, linestatus F/O, shipdate =
    orderdate + 1..95 d
  * region/nation copied from the fixture (fixed 5/25-row domains)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os as _os

# r12: the generator is scale-parameterized so the same fresh-draw
# recipes produce /tmp/sf10 (SPARK_GRAFT_GEN_MULT=10) for the sf10
# spot sweep — every magnitude has found a new divergence class.
_MULT = int(_os.environ.get("SPARK_GRAFT_GEN_MULT", "1"))
DST = _os.environ.get("SPARK_GRAFT_GEN_DST", "/tmp/sf1")
SRC = "/root/testdata/sf0.1"

N_CUST = 150_000 * _MULT
N_SUPP = 10_000 * _MULT
N_PART = 200_000 * _MULT
N_ORD = 1_500_000 * _MULT

CORE_28 = (
    "filter_project", "join_broadcast", "join_sortmerge", "join_semi_anti",
    "agg_groupby", "agg_rollup", "agg_cube", "agg_grouping_sets",
    "window_rank", "window_running", "window_analytics", "topk_orders",
    "pivot_orders", "agg_percentile_dist",
    "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q7", "tpch_q8", "tpch_q9",
    "tpch_q10", "tpch_q13", "tpch_q14", "tpch_q16", "tpch_q18",
    "tpch_q19", "tpch_q21", "tpch_q22",
)

ADJ = ("blue", "cold", "hot", "large", "small", "red", "green", "old")
NOUN = ("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
TYPES = ("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
SEGS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
PRIOS = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def _gen(spark) -> None:
    from pyspark.sql import functions as F

    if Path(DST).exists():
        print(f"sf1 exists at {DST}")
        return

    def u(salt: str, mod: int, *extra):
        """Deterministic uniform int in [0, mod): xxhash64 of the row id
        (+ any extra cols) with a per-column salt."""
        return F.pmod(F.xxhash64(F.col("id"), *extra, F.lit(salt)), F.lit(mod))

    def pick(salt: str, options, *extra):
        return F.element_at(
            F.array(*[F.lit(o) for o in options]),
            (u(salt, len(options), *extra) + 1).cast("int"),
        )

    ts0 = F.lit("1995-01-01").cast("date")

    cust = spark.range(N_CUST).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        u("cnat", 25).cast("int").alias("c_nationkey"),
        ((u("cbal", 1_100_001) - F.lit(100_000)) / 100.0).alias("c_acctbal"),
        pick("cseg", SEGS).alias("c_mktsegment"),
    )
    supp = spark.range(N_SUPP).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        u("snat", 25).cast("int").alias("s_nationkey"),
        ((u("sbal", 1_100_001) - F.lit(100_000)) / 100.0).alias("s_acctbal"),
    )
    part = spark.range(N_PART).select(
        F.col("id").alias("p_partkey"),
        F.concat(pick("padj", ADJ), F.lit(" "), pick("pnoun", NOUN)).alias(
            "p_name"
        ),
        F.format_string(
            "Brand#%d", (u("pbrand", 25) + 1).cast("int")
        ).alias("p_brand"),
        pick("ptype", TYPES).alias("p_type"),
        (u("psize", 50) + 1).cast("int").alias("p_size"),
        (F.lit(900.0) + u("pprice", 10_000) / 100.0).alias("p_retailprice"),
    )
    orders = spark.range(N_ORD).select(
        F.col("id").alias("o_orderkey"),
        u("ocust", N_CUST).alias("o_custkey"),
        pick("ostat", ("O", "P", "F")).alias("o_orderstatus"),
        ((u("oprice", 44_900_001) + F.lit(100_000)) / 100.0).alias(
            "o_totalprice"
        ),
        F.date_add(ts0, u("odate", 2404).cast("int"))
        .cast("timestamp")
        .alias("o_orderdate"),
        pick("oprio", PRIOS).alias("o_orderpriority"),
        (u("nl", 7) + 1).cast("int").alias("_n_lines"),
    )
    li = (
        orders.select(
            F.col("o_orderkey").alias("id"),  # hash base for line draws
            "o_orderdate",
            F.explode(F.sequence(F.lit(1), F.col("_n_lines"))).alias(
                "l_linenumber"
            ),
        )
        .select(
            F.col("id").alias("l_orderkey"),
            u("lpart", N_PART, F.col("l_linenumber")).alias("l_partkey"),
            u("lsupp", N_SUPP, F.col("l_linenumber")).alias("l_suppkey"),
            "l_linenumber",
            (u("lqty", 50, F.col("l_linenumber")) + 1)
            .cast("double")
            .alias("l_quantity"),
            (
                (u("lprice", 10_410_001, F.col("l_linenumber"))
                 + F.lit(90_000)) / 100.0
            ).alias("l_extendedprice"),
            (u("ldisc", 11, F.col("l_linenumber")) / 100.0).alias(
                "l_discount"
            ),
            (u("ltax", 9, F.col("l_linenumber")) / 100.0).alias("l_tax"),
            pick("lrf", ("A", "N", "R"), F.col("l_linenumber")).alias(
                "l_returnflag"
            ),
            pick("lls", ("F", "O"), F.col("l_linenumber")).alias(
                "l_linestatus"
            ),
            F.date_add(
                F.col("o_orderdate").cast("date"),
                (u("lship", 95, F.col("l_linenumber")) + 1).cast("int"),
            )
            .cast("timestamp")
            .alias("l_shipdate"),
        )
    )
    for name, df in (
        ("customer", cust), ("supplier", supp), ("part", part),
        ("orders", orders.drop("_n_lines")), ("lineitem", li),
    ):
        df.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"wrote {name}")
    for name in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{name}.parquet")
        print(f"wrote {name} (fixture domain)")




def _gen_nonrel(spark) -> None:
    """The non-relational 10x tables (round-10 verdict item 5: the sf1
    confidence sweep covers ALL 81 headline queries, not just the
    relational core): documents 50k / embeddings 20k / events 1M, drawn
    fresh from the sf0.1 fixture's observed domains (31-word vocab,
    5 langs, 20 sources, 64-dim unit vectors, 5 event types over the
    same 30-day window) with the same deterministic xxhash64 draws."""
    from pyspark.sql import functions as F

    if Path(f"{DST}/events.parquet").exists():
        print(f"sf1 non-relational tables exist at {DST}")
        return

    def u(salt: str, mod: int, *extra):
        return F.pmod(F.xxhash64(F.col("id"), *extra, F.lit(salt)), F.lit(mod))

    def pick(salt: str, options, *extra):
        return F.element_at(
            F.array(*[F.lit(o) for o in options]),
            (u(salt, len(options), *extra) + 1).cast("int"),
        )

    VOCAB = (
        "a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line", "merge",
        "order", "part", "query", "row", "scan", "slow", "small", "sort",
        "spark", "stream", "table", "the", "value", "vector", "window",
    )
    LANGS = ("en", "en", "de", "es", "fr", "zh")  # ~en-heavy like sf0.1
    docs = (
        spark.range(50_000 * _MULT)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), (u("ndw", 51) + F.lit(29)).cast("int")),
                    lambda i: F.element_at(
                        F.array(*[F.lit(w) for w in VOCAB]),
                        (
                            F.pmod(
                                F.xxhash64(F.col("id"), i, F.lit("dw")),
                                F.lit(len(VOCAB)),
                            )
                            + 1
                        ).cast("int"),
                    ),
                ),
                " ",
            ).alias("text"),
            pick("dlang", LANGS).alias("lang"),
            F.concat(F.lit("src"), (u("dsrc", 20)).cast("string")).alias(
                "source"
            ),
        )
        .withColumn("n_chars", F.length("text"))
    )
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("id"), i, F.lit("ev")), F.lit(2001))
            - F.lit(1000)
        ).cast("double")
        / 1000.0,
    )
    norm = F.sqrt(
        F.aggregate(
            raw, F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    emb = spark.range(20_000 * _MULT).select(
        F.col("id").alias("vec_id"),
        F.transform(raw, lambda x: (x / norm).cast("float")).alias(
            "embedding"
        ),
        u("elab", 10).cast("int").alias("label"),
    )
    ts0 = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    events = spark.range(1_000_000 * _MULT).select(
        F.col("id").alias("event_id"),
        (ts0 + F.make_dt_interval(
            F.lit(0), F.lit(0), F.lit(0),
            u("ets", 2_592_000) + u("eus", 1_000_000) / 1e6,
        )).cast("timestamp_ntz").alias("ts"),
        u("eu", 15_000 * _MULT).alias("user_id"),
        pick("etype", ("view", "view", "view", "click", "click",
                       "signup", "error", "purchase")).alias("event_type"),
        F.when(
            pick("etype", ("view", "view", "view", "click", "click",
                           "signup", "error", "purchase"))
            == F.lit("purchase"),
            u("eval", 56_022).cast("double") / 100.0,
        ).otherwise(F.lit(0.0)).alias("value"),
        F.concat(F.lit('{"k": '), u("eprop", 100).cast("string"),
                 F.lit("}")).alias("props"),
    )
    for name, df in (("documents", docs), ("embeddings", emb),
                     ("events", events)):
        df.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"wrote {name}")


def _force(df) -> int:
    from pyspark.sql import functions as F

    row = df.select(
        F.count(F.lit(1)).alias("n"),
        *[F.count(c).alias(f"c{i}") for i, c in enumerate(df.columns)],
    ).collect()[0]
    return row["n"]


def main() -> None:
    from vector_ai_npm_spark import registry
    from vector_ai_npm_spark.session import get_spark

    spark = get_spark("sf1-study")
    _gen(spark)
    _gen_nonrel(spark)
    if "--gen-only" in sys.argv:
        spark.stop()
        return
    queries = registry.all_queries()
    print(f"{'query':22s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s} {'rows@sf1':>9s}")
    def timed(sf: str, fn) -> float:
        t0 = time.perf_counter()
        _force(fn(spark, sf))
        return time.perf_counter() - t0

    for n in CORE_28:
        fn = queries[n]
        _force(fn(spark, SRC))  # warmup
        t1 = min(timed(SRC, fn) for _ in range(2))
        tS = min(timed(DST, fn) for _ in range(2))
        rows = _force(fn(spark, DST))
        print(f"{n:22s} {t1:8.2f} {tS:8.2f} {tS / t1:6.1f} {rows:9d}")
    spark.stop()


if __name__ == "__main__":
    main()

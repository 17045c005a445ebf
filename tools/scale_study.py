#!/usr/bin/env python
"""10× scale study: replicate the sf0.1 fixtures with shifted keys into
/tmp, then time selected queries at 1× vs 10× (steady-state best-of-2).

    python tools/scale_study.py [q1 q2 ...]

Replication semantics (what "10× bigger" means here):
  * fact tables (events, lineitem, orders, customer, documents,
    embeddings) get 10 copies with SHIFTED surrogate keys — key spread
    grows with data, as on a real corpus (no artificial hot keys);
  * dimension tables (region, nation, supplier, part) stay fixed;
  * document TEXT is copied verbatim, so every doc gains 9 planted
    near-duplicates — near-dup outputs therefore grow ~100× by design
    (pairs track output size, not input²), matching BASELINE.md §4.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SRC = "/root/testdata/sf0.1"
# replication factor: SCALE_COPIES env (default 10); the 100x spot
# study (BASELINE.md §4l) runs SCALE_COPIES=100
import os as _os
COPIES = int(_os.environ.get("SCALE_COPIES", "10"))
DST = f"/tmp/sf0.1_x{COPIES}"

SHIFTS = {
    "events": {"event_id": 10**9, "user_id": 10**6},
    "lineitem": {"l_orderkey": 10**9},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**8},
    "customer": {"c_custkey": 10**8},
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
}
DIMS = ("region", "nation", "supplier", "part")

DEFAULT_QUERIES = (
    "sessionize",
    "text_tfidf",
    "dedup_components",
    "agg_percentile_dist",
    "tpch_q8",
    "tpch_q21",
    "cdc_scd2_merge",
)


def build_replica(spark) -> None:
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.io.sources import load_table

    if Path(DST).exists():
        print(f"replica exists at {DST}")
        return
    for t, shifts in SHIFTS.items():
        base = load_table(spark, SRC, t)
        parts = []
        for i in range(COPIES):
            df = base
            for col, step in shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"wrote {t}")
    for t in DIMS:
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
        print(f"wrote {t} (dim, 1x)")


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

    names = sys.argv[1:] or list(DEFAULT_QUERIES)
    spark = get_spark("scale-study")
    build_replica(spark)
    queries = registry.all_queries()
    print(f"{'query':24s} {'1x':>8s} {'10x':>8s} {'ratio':>6s} {'rows@10x':>9s}")
    for n in names:
        fn = queries[n]
        _force(fn(spark, SRC))  # warmup
        t1 = min(
            _timed(_force, fn, spark, SRC) for _ in range(2)
        )
        rows = [0]
        t10 = min(
            _timed(lambda d: rows.__setitem__(0, _force(d)), fn, spark, DST)
            for _ in range(2)
        )
        print(f"{n:24s} {t1:8.2f} {t10:8.2f} {t10 / t1:6.1f} {rows[0]:9d}")
    spark.stop()


def _timed(force, fn, spark, sf) -> float:
    t0 = time.perf_counter()
    force(fn(spark, sf))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()

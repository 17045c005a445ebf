#!/usr/bin/env python
"""Round-12 item 3: dedup_near_lsh cost at sf1 via the banded route.

r11: the MLlib MinHashLSH self-join at 50k docs blew a 10-minute idle
budget (OR-only amplification = quadratic candidates).  r12 routes the
face through the banded AND x OR core above MLLIB_LSH_MAX_DOCS.  This
measures: wall time of dedup_near_lsh at sf1, and the planted-recall
contract (lsh_dedup_recall) at sf1.

    python tools/lsh_route_study.py [sf_dir]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"


def main():
    from vector_ai_npm_spark.registry import all_queries

    qs = all_queries()

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("lsh-route-study").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in ("dedup_near_lsh", "lsh_dedup_recall"):
        fn = qs[name]
        t0 = time.time()
        rows = fn(spark, SF_DIR).collect()
        dt = time.time() - t0
        head = rows[:3]
        print(f"{name}: {len(rows)} rows in {dt:.1f}s head={head}", flush=True)


if __name__ == "__main__":
    main()

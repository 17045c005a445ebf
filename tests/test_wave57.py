"""Wave 57: checkpoint-restart exactly-once source tracking."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table

SF = "/root/testdata/sf0.001"


def test_restart_resumes_without_reprocessing(spark):
    """Three lifetimes: each restart mints exactly the new files'
    versions, continuing the batch-id sequence, and a restart with NO
    new input publishes nothing."""
    from vector_ai_npm_spark.streaming.sinks import (
        _store_versions,
        final_totals,
        run_upsert_stream,
    )

    ev = load_table(spark, SF, "events").select("user_id", "value")
    thirds = ev.randomSplit([1.0, 1.0, 1.0], seed=7)
    base = tempfile.mkdtemp(prefix="restart3_")
    ind, store, ckpt = f"{base}/in", f"{base}/store", f"{base}/ckpt"

    thirds[0].repartition(2).write.parquet(ind)
    run_upsert_stream(spark, ind, store, ckpt)
    v1 = _store_versions(store)
    assert v1 == [0, 1]

    # idle restart: no new files → no new versions
    run_upsert_stream(spark, ind, store, ckpt)
    assert _store_versions(store) == v1

    thirds[1].repartition(3).write.mode("append").parquet(ind)
    run_upsert_stream(spark, ind, store, ckpt)
    v2 = _store_versions(store)
    assert [v for v in v2 if v not in v1] == [2, 3, 4]

    thirds[2].repartition(1).write.mode("append").parquet(ind)
    run_upsert_stream(spark, ind, store, ckpt)
    v3 = _store_versions(store)
    assert [v for v in v3 if v not in v2] == [5]

    tot = final_totals(spark, store)
    batch = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(30,8)"))
        .cast("decimal(38,8)").cast("string").cast("double").alias("tv"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = tot.join(batch, "user_id").where(
        (F.col("total_value") != F.col("tv"))
        | (F.col("n_events") != F.col("n"))
    )
    assert bad.count() == 0
    assert tot.count() == batch.count()

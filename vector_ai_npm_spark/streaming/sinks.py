"""foreachBatch incremental-merge sink (B28+): per-user totals upserted
into a versioned parquet store, one merge per micro-batch.

Reference context: the reference's only sink is a Postgres INSERT loop
(vector-client.ts:310-341, one round-trip per chunk batch); this is the
streaming-native equivalent — idempotent micro-batch merges instead of
row-at-a-time inserts.

Why versioned directories instead of overwrite-in-place: a merge must
read the current store AND rewrite it; parquet overwrite of a path being
read is undefined. Writing ``store/v{batch_id}`` and resolving "latest"
by max version makes every micro-batch an atomic, idempotent publish —
re-running batch N just rewrites v{N} with identical content (foreachBatch
is at-least-once; idempotence is on us). The same layout works at 100 TB:
the store is partition-parallel parquet, the merge is a single shuffle on
the grouping key, and old versions are GC-able by version number.

State stays EXACT decimal in the store so cross-batch accumulation is
order-independent — the final read casts to double exactly like
functions.numeric.dsum, which is what lets an end-to-end STREAMING sink
hash-match a one-shot SQL oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DEC = "decimal(30,8)"


def _store_versions(store_dir: str) -> list[int]:
    """Committed versions only: a version dir counts once its _SUCCESS
    marker exists (Hadoop commit protocol writes it last), so a crashed
    mid-write v{N} is never trusted."""
    if not os.path.isdir(store_dir):
        return []
    return sorted(
        int(d[1:]) for d in os.listdir(store_dir)
        if d.startswith("v") and d[1:].isdigit()
        and os.path.exists(os.path.join(store_dir, d, "_SUCCESS"))
    )


def read_store(
    spark: SparkSession, store_dir: str, before: int | None = None
) -> DataFrame | None:
    """Latest published version of the running totals, or None.

    ``before=b`` restricts to versions strictly below ``b`` — the merge
    path MUST use this: foreachBatch is at-least-once, so a retry of
    batch N after v{N} was published but before the checkpoint committed
    would otherwise merge the batch into a store that already contains
    it, double-counting (exactly-once would silently break)."""
    versions = _store_versions(store_dir)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    return spark.read.parquet(os.path.join(store_dir, f"v{versions[-1]}"))


def merge_batch(batch: DataFrame, batch_id: int, store_dir: str) -> None:
    """One micro-batch merge: partial-aggregate the batch, union with the
    newest store version STRICTLY BELOW batch_id, re-aggregate, publish
    as v{batch_id}. Re-running batch N therefore always reads the same
    base state and rewrites v{N} with identical content — idempotent
    under foreachBatch's at-least-once contract."""
    spark = batch.sparkSession
    delta = batch.groupBy("user_id").agg(
        F.sum(F.col("value").cast(_DEC)).cast(_DEC).alias("total_value_dec"),
        F.count(F.lit(1)).alias("n_events"),
    )
    current = read_store(spark, store_dir, before=batch_id)
    if current is not None:
        delta = (
            current.unionByName(delta)
            .groupBy("user_id")
            .agg(
                F.sum("total_value_dec").cast(_DEC).alias("total_value_dec"),
                F.sum("n_events").alias("n_events"),
            )
        )
    delta.write.mode("overwrite").parquet(os.path.join(store_dir, f"v{batch_id}"))


def run_upsert_stream(
    spark: SparkSession, input_dir: str, store_dir: str, checkpoint_dir: str
) -> None:
    """Tail input_dir one file per trigger (forcing a REAL multi-batch
    incremental merge, not one big batch) until exhausted.

    Owner pin (r10 verdict item 8): version numbers ARE the stream's
    batch ids, so a second stream with a DIFFERENT checkpoint would
    publish colliding v-dirs that silently shadow this stream's totals.
    claim_store pins the store to one checkpoint lifetime — a restart
    on the same checkpoint re-claims (no-op), any other stream raises
    StoreWriterConflict before writing a byte."""
    import os

    from vector_ai_npm_spark.io.lease import claim_store

    claim_store(store_dir, os.path.realpath(checkpoint_dir))
    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, i: merge_batch(b, i, store_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def final_totals(spark: SparkSession, store_dir: str) -> DataFrame:
    """Published totals with the decimal state cast to double (same bits
    as a one-shot dsum over the full input)."""
    store = read_store(spark, store_dir)
    assert store is not None, "upsert stream published no versions"
    return store.select(
        "user_id",
        F.col("total_value_dec").cast("double").alias("total_value"),
        F.col("n_events"),
    )

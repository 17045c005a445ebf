"""Streaming incremental near-dup — the crawl-ingest dedup loop.

`dedup_incremental` (dedup/queries.py) is the batch face of steady-state
dedup: check a new batch against the stored signature table, never
re-dedup the corpus. This module is the STREAMING face: documents
arrive in micro-batches, each foreachBatch merge LSH-checks the batch
against the versioned BAND store accumulated so far, publishes updated
bands and accept/reject decisions as an atomic version (the
streaming.sinks discipline: read strictly-below batch_id, rewrite
v{batch_id} — idempotent under at-least-once).

Decision rule (deliberately ORDER-INDEPENDENT, so the final store is
identical for any micro-batch arrival order AND SQL-expressible for the
driver oracle): a document is rejected iff it shares an LSH band with
ANY smaller-doc_id document — the first-id-canonical rule. Cross-batch
pairs are found when the second member arrives (the store holds the
first); if the later batch carries the SMALLER id, the merge DEMOTES
the stored larger doc from accepted to rejected — the late-arriving-
canonical revision a real crawl pipeline must handle.

Scale shape: per batch, one band-key equi-join of the batch's bands
against (store ∪ batch) — O(batch + matches), the corpus text is never
re-read; the band store is signatures only (72 B/doc). The full-store
rewrite per version mirrors streaming.sinks.merge_batch for contract
size; a production deployment appends id-ranged partitions instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.streaming.sinks import read_store


def doc_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band_key) LSH bands — identical expressions to the
    batch dedup family (shared band keys = shared signature store)."""
    from vector_ai_npm_spark.dedup.queries import (
        _BAND_KEYS_SPARK,
        _SPARK_SHINGLES,
        _spark_minhash,
        N_MINHASH,
    )

    sh = docs.select("doc_id", F.expr(_SPARK_SHINGLES).alias("shingles"))
    sig = sh.select(
        "doc_id",
        *[F.expr(_spark_minhash(i)).alias(f"mh{i}") for i in range(N_MINHASH)],
    )
    return sig.select(
        "doc_id",
        F.explode(F.array(*[F.expr(k) for k in _BAND_KEYS_SPARK])).alias(
            "band_key"
        ),
    )


def dedup_merge_batch(
    batch: DataFrame, batch_id: int, bands_dir: str, decisions_dir: str
) -> None:
    """One micro-batch of the crawl-dedup loop (see module docstring)."""
    spark = batch.sparkSession
    new_bands = doc_bands(batch)
    prior_bands = read_store(spark, bands_dir, before=batch_id)
    all_bands = (
        new_bands
        if prior_bands is None
        else prior_bands.unionByName(new_bands)
    )

    def smaller_id_matches(candidates: DataFrame, targets: DataFrame) -> DataFrame:
        """target doc_ids having a band-mate with a smaller doc_id among
        candidates."""
        return (
            candidates.alias("a")
            .join(
                targets.alias("b"),
                (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("b.doc_id").alias("doc_id"))
            .distinct()
        )

    rejected_new = smaller_id_matches(all_bands, new_bands)
    new_dec = (
        batch.select("doc_id")
        .distinct()
        .join(rejected_new.withColumn("_rej", F.lit(True)), "doc_id", "left")
        .select("doc_id", F.col("_rej").isNull().alias("accepted"))
    )

    prior_dec = read_store(spark, decisions_dir, before=batch_id)
    if prior_dec is not None and prior_bands is not None:
        demote = smaller_id_matches(new_bands, prior_bands).withColumn(
            "_dem", F.lit(True)
        )
        prior_dec = prior_dec.join(demote, "doc_id", "left").select(
            "doc_id",
            (F.col("accepted") & F.col("_dem").isNull()).alias("accepted"),
        )
    decisions = (
        new_dec if prior_dec is None else prior_dec.unionByName(new_dec)
    )

    all_bands.write.mode("overwrite").parquet(
        os.path.join(bands_dir, f"v{batch_id}")
    )
    decisions.write.mode("overwrite").parquet(
        os.path.join(decisions_dir, f"v{batch_id}")
    )


def run_crawl_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    bands_dir: str,
    decisions_dir: str,
    checkpoint_dir: str,
) -> None:
    """Tail input_dir one file per trigger until exhausted — a REAL
    multi-batch incremental dedup, not one big batch."""
    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, i: dedup_merge_batch(b, i, bands_dir, decisions_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def final_decisions(spark: SparkSession, decisions_dir: str) -> DataFrame:
    store = read_store(spark, decisions_dir)
    assert store is not None, "crawl-dedup stream published no versions"
    return store.select("doc_id", "accepted")

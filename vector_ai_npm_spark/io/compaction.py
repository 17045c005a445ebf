"""Small-files compaction — the OPTIMIZE/rewrite-data-files maintenance op.

Why it exists: a 100 TB table accreted by many incremental writes
(streaming micro-batches, per-partition appends, the versioned-publish
sink in streaming.sinks) ends up as millions of KB-sized parquet files.
Every downstream scan then pays per-file open/footer/seek costs and the
scheduler pays per-split overhead — the classic small-files problem.
Table formats productionize the fix as `OPTIMIZE` (Delta) /
`rewrite_data_files` (Iceberg); the engine-level primitive is the same:
read, re-bucket to ~target-sized outputs, atomically republish.

Shape choices:
  * file count is derived from the ACTUAL on-disk bytes (driver-side
    listing — metadata-scale work), never hardcoded;
  * `coalesce(n)` merges partitions WITHOUT a shuffle — each output
    task concatenates whole input splits, so compaction cost is one
    read+write pass. `repartition(n)` (full shuffle) is only worth it
    when inputs are skewed enough that merge-only produces uneven
    files — exposed via `shuffle=True`;
  * the rewrite lands in a NEW directory (version-flip publish), never
    in place — readers of the old layout are undisturbed until the
    pointer swap, same discipline as streaming.sinks.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _part_files(path: str) -> list[str]:
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".parquet")
    ]


def data_file_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the parquet data files in `path`."""
    files = _part_files(path)
    return len(files), sum(os.path.getsize(f) for f in files)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
    shuffle: bool = False,
) -> int:
    """Rewrite `src`'s many small parquet files into ~target-sized files
    at `dst`; returns the planned output file count."""
    _, total = data_file_stats(src)
    n = max(1, math.ceil(total / target_file_bytes))
    df: DataFrame = spark.read.parquet(src)
    df = df.repartition(n) if shuffle else df.coalesce(n)
    df.write.mode("overwrite").parquet(dst)
    return n


def export_training_shards(
    df, path: str, max_rows_per_shard: int = 1000
) -> "DataFrame":
    """Write ``df`` as fixed-size training shards + return the MANIFEST.

    The training-loader handoff (WebDataset/Mosaic-style): downstream
    data loaders want uniformly-sized shards they can shuffle, assign
    to workers, and resume by — not whatever file sizes the last
    shuffle happened to produce. ``maxRecordsPerFile`` bounds rows per
    file on the write side (each task splits its output at the bound),
    and the manifest — one row per shard file with row count and an
    order-insensitive content hash — is what the loader (and the
    resume logic) consumes instead of listing the filesystem.

    Scale shape: the write adds NO shuffle (the bound splits within
    each task's stream); the manifest is one scan of the written
    shards grouped by input_file_name — a metadata-sized result."""
    from pyspark.sql import functions as F

    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_rows_per_shard)
        .parquet(path)
    )
    spark = df.sparkSession
    written = spark.read.parquet(path)
    cols = [c for c in written.columns]
    return (
        written.withColumn(
            "_shard", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        .groupBy("_shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(wraparound_sum_sig(f"xxhash64({', '.join(cols)})"))
            .alias("content_sig"),
        )
        .select(F.col("_shard").alias("shard_file"), "n_rows", "content_sig")
    )


def wraparound_sum_sig(hash_expr: str) -> str:
    """Order-insensitive content signature: SUM of 64-bit row hashes with
    mod-2^64 wraparound, returned as BIGINT.

    A bit_xor fold cancels any row with even multiplicity (a shard that
    duplicates one row and drops another identical pair hashes the
    same); a sum fold makes multiplicity count.  ANSI mode (Spark 4
    default) makes sum(BIGINT) throw on overflow, so the fold sums in
    DECIMAL(38,0) — |sum| <= 2^63 * n_rows stays well under 10^38 for
    any shard a loader would accept — then maps back into the signed
    64-bit range with an explicit wraparound."""
    two64 = "18446744073709551616"
    two63 = "9223372036854775808"
    s = f"sum(CAST(({hash_expr}) AS DECIMAL(38,0)))"
    return (
        f"CAST((((({s}) % {two64}) + {two64} + {two63}) % {two64})"
        f" - {two63} AS BIGINT)"
    )

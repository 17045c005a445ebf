"""Wave 38b: streaming dead-letter routing.

`stream_dlq_route` — the robustness contract every production stream
needs and the quarantine face (multimodal) already has for batch
decode: malformed records must be ROUTED, not dropped and not fatal.
A real availableNow file stream (one file per trigger — the
stream_ivf_append harness) carries events whose JSON props field is
corrupted on a deterministic rule (event_id % 17 → truncated JSON);
each micro-batch splits on parse success and writes BOTH legs under
batch-keyed overwrite subtrees (`good/batch=<epoch>`,
`dlq/batch=<epoch>` — the round-9 replay-idempotence layout, so an
at-least-once re-delivery converges), the DLQ leg carrying the raw
record plus an error column for later replay/triage.

Contract pinned (oracle-checked): input row conservation
(good + dlq = input), the DLQ holding EXACTLY the rule-corrupted rows,
content integrity of the good leg (Σk over parsed JSON), and one
batch per input file.

Scale shape: per micro-batch work is two filtered appends of THAT
batch only; parse classification is a codegen JSON path walk
(get_json_object), no Python; the DLQ keeps full records so nothing
needs re-ingestion after a parser fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_N_FILES = 3
_CORRUPT_MOD = 17


@query(
    "stream_dlq_route",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
           CAST(COUNT(*) FILTER (WHERE event_id % {_CORRUPT_MOD} <> 0)
                AS BIGINT) AS n_good,
           CAST(COUNT(*) FILTER (WHERE event_id % {_CORRUPT_MOD} = 0)
                AS BIGINT) AS n_dlq,
           CAST(SUM(CASE WHEN event_id % {_CORRUPT_MOD} <> 0 THEN
                 CAST(json_extract_string(props, '$.k') AS BIGINT)
               ELSE 0 END) AS BIGINT) AS good_k_sum,
           CAST({_N_FILES} AS BIGINT) AS n_batches,
           TRUE AS conservation_ok,
           TRUE AS dlq_matches_rule
    FROM events
    """,
)
def stream_dlq_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dead-letter routing — see module docstring."""
    import glob
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "props"
    )
    # plant the corruption: truncated JSON on the deterministic rule
    src = ev.withColumn(
        "props",
        F.when(
            F.col("event_id") % _CORRUPT_MOD == 0,
            F.substring("props", 1, 3),
        ).otherwise(F.col("props")),
    )
    root = tempfile.mkdtemp(prefix="dlq_stream_")
    input_dir, good_dir, dlq_dir, ckpt = (
        f"{root}/in", f"{root}/good", f"{root}/dlq", f"{root}/ckpt",
    )
    src.repartition(_N_FILES).write.parquet(input_dir)
    n_files = len(glob.glob(f"{input_dir}/part-*.parquet"))
    schema = spark.read.parquet(input_dir).schema

    def _route(batch: DataFrame, epoch_id: int) -> None:
        k = F.get_json_object("props", "$.k").cast("bigint")
        classified = batch.withColumn("k", k)
        (
            classified.where(F.col("k").isNotNull())
            .drop("k")
            .write.mode("overwrite")
            .parquet(f"{good_dir}/batch={int(epoch_id)}")
        )
        (
            classified.where(F.col("k").isNull())
            .drop("k")
            .withColumn("dlq_reason", F.lit("json_parse_failure"))
            .write.mode("overwrite")
            .parquet(f"{dlq_dir}/batch={int(epoch_id)}")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_route)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    good = spark.read.parquet(f"{good_dir}/batch=*")
    dlq = spark.read.parquet(f"{dlq_dir}/batch=*")
    n_batches = len(glob.glob(f"{good_dir}/batch=*"))
    g = good.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_good"),
        F.sum(F.get_json_object("props", "$.k").cast("bigint"))
        .cast("bigint")
        .alias("good_k_sum"),
        F.sum(
            F.when(F.col("event_id") % _CORRUPT_MOD == 0, 1).otherwise(0)
        ).alias("good_rule_violations"),
    )
    d = dlq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dlq"),
        F.sum(
            F.when(F.col("event_id") % _CORRUPT_MOD != 0, 1).otherwise(0)
        ).alias("dlq_rule_violations"),
    )
    n_input = src.agg(F.count(F.lit(1)).cast("bigint").alias("n_input"))
    return (
        n_input.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(d))
        .select(
            "n_input",
            "n_good",
            "n_dlq",
            "good_k_sum",
            F.lit(n_batches).cast("bigint").alias("n_batches"),
            (F.col("n_good") + F.col("n_dlq") == F.col("n_input")).alias(
                "conservation_ok"
            ),
            (
                (F.col("dlq_rule_violations") == 0)
                & (F.col("good_rule_violations") == 0)
                & (F.lit(n_files) == F.lit(n_batches))
            ).alias("dlq_matches_rule"),
        )
    )

"""Stream-stream interval join (B26+): click→purchase attribution.

Reference context: the reference has no streaming engine at all (its
ingest is a one-shot batch loop, vector-client.ts:141-152); this module
is part of the Spark-native extension surface — the same attribution
logic a real event pipeline runs continuously.

The transform is written once and used twice: on batch DataFrames for
the oracle-checked registry entry, and on watermarked readStream inputs
in tests/test_streaming.py (inner stream-stream joins emit on match, so
batch ≡ stream after processAllAvailable).

Scale notes: an INNER join with BOTH a key equality and a two-sided
time bound is Structured Streaming's bounded-state sweet spot — each
side buffers only rows younger than (watermark − interval), state
expires monotonically, and the shuffle is on user_id alone. In batch
mode the same condition lands on a sort-merge join with the range as a
residual — never a cartesian (pinned by tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "4 hours"


def split_clicks_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project the two event roles with disjoint column names (a
    self-join in streaming mode needs two distinct watermarked inputs)."""
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    return clicks, purchases


def attribute_purchases(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Every (click, purchase) pair for the same user where the purchase
    lands within ATTRIBUTION_WINDOW after the click."""
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
        )
    )
    return clicks.join(purchases, cond).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
        "amount",
    )


def attribute_clicks_left_outer(
    clicks: DataFrame, purchases: DataFrame
) -> DataFrame:
    """Wave 53: the LEFT OUTER attribution — every click, with NULL
    purchase columns for clicks that never converted inside the
    window.  The conversion-rate denominator an inner join silently
    drops.

    Streaming semantics (why this face exists beyond the inner join):
    outer null results can only emit once the watermark proves no
    matching purchase can still arrive — i.e. rows are held in state
    until click_ts + window + delay < watermark, then evicted WITH
    their verdict.  The batch face here is the oracle-checked
    fixpoint; tests/test_streaming.py runs the real double-watermarked
    stream and proves it converges to this result once the watermark
    is pushed past the tail (the flush-sentinel pattern — a stream
    that simply stops never emits its last unmatched clicks, which is
    exactly the eviction semantics worth pinning)."""
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
        )
    )
    return clicks.join(purchases, cond, "left_outer").select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
        "amount",
    )

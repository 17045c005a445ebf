"""Custom stateful streaming operator via applyInPandasWithState.

The brief's "custom stateful operators" slot: a per-user running
aggregate (event count, value sum, last event time) maintained as
explicit keyed state across micro-batches. Structured Streaming's
built-in aggregations could express this particular fold; the point of
the exercise is the state API plumbing — schema'd GroupState, timeout
handling, update-mode emission — which is what a genuinely custom
operator (e.g. sessionized feature accumulation, CDC merge) needs.

Scale shape: state lives partitioned by the grouping key in the state
store (RocksDB/HDFS-backed on a cluster); each micro-batch shuffles only
that batch's rows to their key partitions. The batch-mode equivalent
(one groupBy) is the oracle face; tests/test_streaming.py feeds the same
rows through the streaming path and asserts the final per-key state
matches the batch answer.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_micros", LongType()),
    ]
)


def user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch face (the oracle): one hash aggregate per user."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("ts").alias("last_ts"),
    )


def _update_user_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """GroupState fold: merge this micro-batch's rows into (count, sum,
    max-ts) state and emit the updated running totals for the key."""
    import datetime

    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            batch_max = pdf["ts"].max()
            last_us = max(last_us, int(pd.Timestamp(batch_max).value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def has_tws_support() -> bool:
    """Capability gate for the transformWithStateInPandas face: the TWS
    Python client speaks protobuf to the JVM state server, so the
    google.protobuf wheel is a hard runtime dependency (the
    applyInPandasWithState face has no such dependency — Arrow only).
    Callers route to :func:`user_totals_stateful` when this is False;
    tests assert the gate raises rather than skipping."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class UserTotalsProcessor(StatefulProcessor):
    """transformWithState face of the same fold (Spark 4's successor API:
    named state variables + timers + RocksDB-backed store instead of a
    single GroupState tuple). Kept semantically identical to
    :func:`_update_user_state` so both faces converge to the batch
    answer in tests/test_streaming.py."""

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._state = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        n, total, last_us = (
            self._state.get() if self._state.exists() else (0, 0.0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                batch_max = pdf["ts"].max()
                last_us = max(last_us, int(pd.Timestamp(batch_max).value // 1000))
        self._state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    def close(self) -> None:
        pass


def user_totals_tws(stream: DataFrame) -> DataFrame:
    """Streaming face on the transformWithState API (requires the
    RocksDB state-store provider — caller sets the conf — and the
    google.protobuf wheel for the Python↔state-server protocol).
    Raises a documented RuntimeError where the wheel is absent instead
    of failing opaquely at stream start."""
    if not has_tws_support():
        raise RuntimeError(
            "transformWithStateInPandas needs the google.protobuf wheel "
            "(the TWS Python client's state-server protocol); it is not "
            "installed. Use user_totals_stateful — the "
            "applyInPandasWithState face of the same fold, with the same "
            "batch-convergence contract."
        )
    proc = UserTotalsProcessor()
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .transformWithStateInPandas(
            proc,
            outputStructType=OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


def user_totals_stateful(stream: DataFrame) -> DataFrame:
    """Streaming face: explicit keyed state, update mode, no timeout
    (the fixture stream is finite; production would set event-time
    timeouts to expire idle users and bound the state store)."""
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# Exact-decimal stateful totals: the driver-checkable face
# --------------------------------------------------------------------------

EXACT_OUT_SCHEMA = "user_id long, n_events long, total_units long, last_us long"
EXACT_STATE_SCHEMA = "n_events long, total_units long, last_us long"

_UNIT = 8  # value quantized to 1e-8 — mirrors CAST(value AS DECIMAL(30,8))


def _value_units(values) -> int:
    """Σ round_half_up(value, 8 dp) in integer 1e-8 units — the exact
    per-row quantization both Spark's and DuckDB's double→DECIMAL(30,8)
    casts apply (via the shortest-repr decimal rendering, which is what
    repr() also produces), so cross-micro-batch accumulation in int
    units is bit-identical to a one-shot SQL decimal sum."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-_UNIT)
    total = 0
    for v in values:
        total += int(
            Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP).scaleb(_UNIT)
        )
    return total


def _update_user_state_exact(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """GroupState fold with EXACT integer state (count, 1e-8 value
    units, max event-time micros) — every emission is reproducible
    regardless of micro-batch boundaries or float addition order."""
    n, units, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        units += _value_units(pdf["value"])
        if len(pdf):
            last_us = max(
                last_us, int(pd.Timestamp(pdf["ts"].max()).value // 1000)
            )
    state.update((n, units, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_units": [units],
            "last_us": [last_us],
        }
    )


class UserTotalsExactProcessor(StatefulProcessor):
    """transformWithState face of the exact-integer fold (same emission
    contract as :func:`_update_user_state_exact`)."""

    def init(self, handle) -> None:
        from pyspark.sql.types import _parse_datatype_string

        self._state = handle.getValueState(
            "totals_exact", _parse_datatype_string(EXACT_STATE_SCHEMA)
        )

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        n, units, last_us = (
            self._state.get() if self._state.exists() else (0, 0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            units += _value_units(pdf["value"])
            if len(pdf):
                last_us = max(
                    last_us, int(pd.Timestamp(pdf["ts"].max()).value // 1000)
                )
        self._state.update((n, units, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_units": [units],
                "last_us": [last_us],
            }
        )

    def close(self) -> None:
        pass


def user_totals_stream_exact(stream: DataFrame) -> DataFrame:
    """The capability-routed stateful-totals stream: transformWithState
    where the protobuf wheel is present, applyInPandasWithState
    otherwise — SAME fold, SAME exact-integer state, SAME emissions, so
    downstream consumers (and the stream_tws_totals driver oracle) see
    one contract regardless of which state API the deployment has."""
    keyed = stream.withColumn("ts", F.col("ts").cast("timestamp")).groupBy(
        "user_id"
    )
    if has_tws_support():
        from pyspark.sql.types import _parse_datatype_string

        return keyed.transformWithStateInPandas(
            UserTotalsExactProcessor(),
            outputStructType=_parse_datatype_string(EXACT_OUT_SCHEMA),
            outputMode="update",
            timeMode="none",
        )
    return keyed.applyInPandasWithState(
        _update_user_state_exact,
        outputStructType=EXACT_OUT_SCHEMA,
        stateStructType=EXACT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming sessionizer: per-EVENT session assignment with carried state
# --------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes, microseconds

SESSION_OUT_SCHEMA = "user_id long, event_id long, ts timestamp, session_seq long"
SESSION_STATE_SCHEMA = "last_us long, seq long"


def _update_session_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gaps-and-islands fold with CARRIED state: the previous
    micro-batch's (last event time, session counter) survive in the
    state store, so a session that spans a batch boundary keeps its
    number instead of restarting — the thing a per-batch window can
    never do. Rows are sorted (ts, event_id) within the batch; the
    correctness contract is per-user event-time-ordered ARRIVAL across
    batches (file source in path order here; production pairs this
    with a watermark that holds back out-of-order feeds)."""
    last_us, seq = state.get if state.exists else (-1, 0)
    pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out_seq = []
    for ts in pdf["ts"]:
        ts_us = int(pd.Timestamp(ts).value // 1000)
        if last_us < 0 or ts_us - last_us > SESSION_GAP_US:
            seq += 1
        last_us = ts_us
        out_seq.append(seq)
    state.update((last_us, seq))
    yield pd.DataFrame(
        {
            "user_id": pdf["user_id"].astype("int64"),
            "event_id": pdf["event_id"].astype("int64"),
            "ts": pdf["ts"],
            "session_seq": pd.Series(out_seq, index=pdf.index, dtype="int64"),
        }
    )


def sessionize_stateful(stream: DataFrame) -> DataFrame:
    """Streaming face of operators.pipeline_ops.sessionize: every event
    carries its (user, session) key as it flows through, sessions
    continue across micro-batches via keyed state."""
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_session_state,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

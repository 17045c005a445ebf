"""Wave 53: left-outer stream-stream join eviction semantics + CSV
dialect sniffing."""

from __future__ import annotations

import tempfile
import time

import pytest
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.dialect import sniff_csv_dialect
from vector_ai_npm_spark.io.sources import load_table


# ------------------------------------------------------------ sniffing


@pytest.mark.parametrize(
    "delim, header",
    [(",", True), (";", False), ("\t", True), ("|", False)],
)
def test_sniff_all_dialects(delim, header):
    lines = []
    if header:
        lines.append(delim.join(["id", "name", "score"]))
    for i in range(10):
        lines.append(delim.join([str(i), f"name{i}", str(i * 1.5)]))
    got = sniff_csv_dialect("\n".join(lines).encode())
    assert got == (delim, header)


def test_sniff_quote_aware():
    """Embedded commas inside quoted fields must not fool the comma
    count — and a doubled quote stays inside the field."""
    lines = [
        'id,name,score',
        '1,"a,b",2.5',
        '2,"say ""hi"", ok",3.5',
        '3,plain,4.5',
    ]
    assert sniff_csv_dialect("\n".join(lines).encode()) == (",", True)


def test_sniff_rejects_garbage_and_short_samples():
    with pytest.raises(ValueError, match="quarantine"):
        sniff_csv_dialect(b"one-field-only\nanother line here\nthird\n")
    with pytest.raises(ValueError, match="2 non-empty"):
        sniff_csv_dialect(b"a,b,c\n")


def test_sniff_prefers_constant_count():
    """Semicolon data containing occasional commas: comma counts vary
    per line, semicolon is constant → semicolon wins."""
    lines = ["1;al,pha;2", "2;beta;3", "3;ga,m,ma;4"]
    assert sniff_csv_dialect("\n".join(lines).encode())[0] == ";"


# ----------------------------------------------- left-outer stream join


def test_left_outer_batch_includes_unmatched_clicks(spark, sf_smoke):
    from vector_ai_npm_spark.streaming.joins import (
        attribute_clicks_left_outer,
        attribute_purchases,
        split_clicks_purchases,
    )

    ev = load_table(spark, sf_smoke, "events")
    clicks, purchases = split_clicks_purchases(ev)
    outer = attribute_clicks_left_outer(clicks, purchases).collect()
    inner = attribute_purchases(clicks, purchases).collect()
    n_clicks = clicks.count()
    matched_clicks = {r.click_id for r in inner}
    outer_matched = [r for r in outer if r.purchase_id is not None]
    outer_null = [r for r in outer if r.purchase_id is None]
    assert {(r.click_id, r.purchase_id) for r in outer_matched} == {
        (r.click_id, r.purchase_id) for r in inner
    }
    assert {r.click_id for r in outer_null} == (
        {r.click_id for r in outer} - matched_clicks
    )
    # every click appears; unmatched ones exactly once with NULL verdict
    assert len({r.click_id for r in outer}) == n_clicks
    assert all(r.amount is None and r.purchase_ts is None for r in outer_null)
    assert len(outer_null) > 0  # the fixture has non-converting clicks


def test_left_outer_stream_converges_to_batch(spark, sf_smoke):
    """The eviction contract: a double-watermarked left-outer stream
    emits NULL verdicts only after the watermark proves no match can
    arrive, so with a flush sentinel pushed past the tail the stream
    result equals the batch face on the real events (sentinel rows
    excluded)."""
    from vector_ai_npm_spark.streaming.joins import (
        attribute_clicks_left_outer,
        split_clicks_purchases,
    )

    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    batch = attribute_clicks_left_outer(*split_clicks_purchases(ev)).collect()

    d = tempfile.mkdtemp(prefix="louter_stream_")
    ev.repartition(2).write.mode("overwrite").parquet(d)
    max_ts = ev.agg(F.max("ts")).first()[0]
    # flush sentinel: one click + one purchase far past the tail, on a
    # user id outside the fixture (excluded from assertions); written
    # LAST so the file source reads it in a later micro-batch and the
    # watermark advances past every real click's eviction deadline
    time.sleep(1.1)  # distinct mtime → later in the file-source order
    sentinel = spark.createDataFrame(
        [
            (10**9, 10**9, "click", max_ts, 0.0),
            (10**9 + 1, 10**9, "purchase", max_ts, 0.0),
        ],
        ev.schema,
    ).select(
        "event_id", "user_id", "event_type",
        (F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"), "value",
    )
    sentinel.coalesce(1).write.mode("append").parquet(d)

    schema = spark.read.parquet(d).schema

    def side():
        s = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(d)
        return s.withColumn("ts", F.col("ts").cast("timestamp"))

    clicks, _ = split_clicks_purchases(side())
    _, purchases = split_clicks_purchases(side())
    joined = attribute_clicks_left_outer(
        clicks.withWatermark("click_ts", "1 minute"),
        purchases.withWatermark("purchase_ts", "1 minute"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_louter")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # outer results emit in the no-data batch after the watermark
        # advances; give the engine a couple of idle cycles
        deadline = time.time() + 30
        want = len(batch)
        while time.time() < deadline:
            rows = [
                r for r in spark.table("t_louter").collect()
                if r.user_id < 10**9
            ]
            if len(rows) >= want:
                break
            time.sleep(1.0)
            q.processAllAvailable()
        stream_rows = [
            r for r in spark.table("t_louter").collect()
            if r.user_id < 10**9
        ]
    finally:
        q.stop()

    key = lambda r: (r.click_id, r.purchase_id)  # noqa: E731
    assert sorted(map(key, stream_rows)) == sorted(map(key, batch))

"""Wave 71: the manifest-CAS table face — ACID appends, optimistic
replace, and time travel over io/tablelog.py (see that module's
docstring for the protocol; tests/test_wave71.py for the N-writer
races).

`store_manifest_acid` drives the full lifecycle the log exists for:
three append commits (thirds of events), a compacting REPLACE computed
against the then-current version, then a post-compaction append — and
reads back both the latest snapshot and an AS-OF read of the second
append, proving (a) replace preserved the exact pre-compaction
content, (b) the later append is invisible to the as-of read, and
(c) row counts and exact-decimal totals match a pure-SQL recompute of
each prefix.  Version numbers are protocol-deterministic (0,1,2
appends → 3 replace → 4 append), so the oracle can pin them.

Scale shape: every commit is one tiny JSON CAS; reads list exactly the
snapshot's files (no directory scans of dead data); the replace
rewrites live data once — the compaction cost, paid when chosen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_DSUM = (
    lambda col: F.sum(F.col(col).cast("decimal(30,8)"))
    .cast("decimal(38,8)")
    .cast("double")
)


@query(
    "store_manifest_acid",
    oracle="""
    WITH b AS (
      SELECT event_id, user_id, value,
             CAST(event_id % 3 AS INTEGER) AS third
      FROM events
    )
    SELECT 'as_of_appends' AS tag, CAST(1 AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(30,8)))
                AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE) AS total_value
    FROM b WHERE third <= 1
    UNION ALL
    SELECT 'post_compact', CAST(3 AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(30,8)))
                AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE)
    FROM b
    UNION ALL
    SELECT 'latest', CAST(4 AS BIGINT),
           CAST(COUNT(*) AS BIGINT) * 2,
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) * 2
                AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE)
    FROM b
    """,
)
def store_manifest_acid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-table lifecycle — see module docstring.  The final
    append doubles the table (the same events again with shifted ids),
    so 'latest' must see 2× rows while 'post_compact' and the as-of
    read are unaffected."""
    import tempfile

    from vector_ai_npm_spark.io.tablelog import (
        append_table,
        read_table,
        replace_table,
        snapshot,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    tdir = tempfile.mkdtemp(prefix="tablelog_")
    for third in (0, 1, 2):
        v = append_table(ev.where(F.col("event_id") % 3 == third), tdir)
    assert v == 2, f"append versions drifted: {v}"

    # compaction: same rows, coalesced files, CAS'd against version 2
    current, _files = snapshot(tdir)
    replace_table(read_table(spark, tdir).coalesce(2), tdir, current)

    # post-compaction append: the whole corpus again with shifted ids
    append_table(
        ev.select(
            (F.col("event_id") + 10**12).alias("event_id"),
            "user_id",
            "value",
        ),
        tdir,
    )

    def stats(tag: str, version: int) -> DataFrame:
        df = read_table(spark, tdir, version)
        return df.agg(
            F.lit(tag).alias("tag"),
            F.lit(version).cast("bigint").alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            _DSUM("value").alias("total_value"),
        )

    return (
        stats("as_of_appends", 1)
        .unionByName(stats("post_compact", 3))
        .unionByName(stats("latest", 4))
    )

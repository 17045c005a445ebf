"""Event-sequence Markov-chain estimation (wave 9).

North-star analytics operator over the `events` fixture stream — the
reference client (vector-client.ts) has no event surface at all; this is
the B-family pipeline build-out (SURVEY §2B analytics).

`events_markov_transitions` estimates the first-order Markov transition
matrix over event types: for each user's time-ordered event stream, count
(prev_type → next_type) transitions and normalize per source state.  The
output is the per-state MLE transition probability — the standard
"what do users do next" model behind next-action prediction, funnel
simulation, and session-generation test harnesses.

Scale design (100 TB):

* ONE user-keyed shuffle produces the per-user ordered stream; the lag
  pair runs inside that single window sort (no self-join — a join-based
  "next event" pairing would shuffle the fact twice and explode on
  hot users).
* The pair aggregate reduces to the type×type matrix — at most
  |types|² rows (25 here) regardless of input size, with map-side
  partial aggregation, so the second shuffle carries matrix-sized
  state, not event-sized.
* Row normalization is a window over the matrix itself (25 rows) —
  never a second pass over the fact.
* Hot-user skew: a user's partition cost is O(events·log events) for
  the sort; the window carries ONE row of state (lag 1). AQE skew
  splitting cannot split a single user_id, but per-user event counts
  are bounded by retention policy in practice (documented contract, as
  for sessionize/join_asof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
    FROM pairs
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams —
    see module docstring for the one-fact-shuffle plan contract.

    Ordering ties broken by event_id (unique) so the lag pairing is
    deterministic cross-engine.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wrow).cast("double"))
        .alias("p"),
    )

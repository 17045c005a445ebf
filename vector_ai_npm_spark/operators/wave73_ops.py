"""Wave 73 (round 12): table-log checkpoints + the banded LSH route.

Two faces over round-12 engine work, each oracle-checked:

* ``store_manifest_checkpoint`` — drives io/tablelog.py across a
  checkpoint boundary: 20 appends (a folded checkpoint record lands at
  version 16, CHECKPOINT_EVERY), then reads latest + two as-of
  versions, one below and one above the checkpoint.  The as-of reads
  prove checkpointed snapshot resolution is byte-equivalent to the
  full fold (time travel must not see the checkpoint as a commit), and
  the face also pins that the checkpoint file actually exists — a
  regression to always-full-fold would silently reintroduce the
  O(versions) snapshot cost this exists to kill.

* ``dedup_near_lsh_routed`` — the banded-minhash candidate core +
  exact token-set jaccard that `mllib_lsh_pairs` routes to above
  MLLIB_LSH_MAX_DOCS (dedup/queries.py, r12: MLlib's OR-only
  MinHashLSH is quadratic on text corpora — measured 10-minute blowout
  at sf1's 50k docs vs 40 s routed).  The route only activates at
  scale, so THIS face pins its semantics with a full hash oracle at
  every sf: candidates from the same band SQL the dedup_minhash_pairs
  oracle uses, exact jaccard distance, threshold 0.6.

Reference scope: §2B B2 (sinks/table format) and B18 (near-dedup);
the reference delegates storage to Postgres (vector-client.ts:141).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query
from vector_ai_npm_spark import registry

_N_APPENDS = 20  # crosses the CHECKPOINT_EVERY=16 boundary

_DSUM = (
    lambda col: F.sum(F.col(col).cast("decimal(30,8)"))
    .cast("decimal(38,8)")
    .cast("double")
)


@query(
    "store_manifest_checkpoint",
    oracle=f"""
    WITH b AS (
      SELECT event_id, value,
             CAST(event_id % {_N_APPENDS} AS INTEGER) AS slice
      FROM events
    )
    SELECT 'asof_pre_ckpt' AS tag, CAST(9 AS BIGINT) AS version,
           CAST(COUNT(*) FILTER (WHERE slice <= 9) AS BIGINT) AS n_rows,
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(30,8)))
                FILTER (WHERE slice <= 9)
                AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE) AS total_value,
           TRUE AS checkpoint_exists
    FROM b
    UNION ALL
    SELECT 'asof_post_ckpt', CAST(18 AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE slice <= 18) AS BIGINT),
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(30,8)))
                FILTER (WHERE slice <= 18)
                AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE),
           TRUE
    FROM b
    UNION ALL
    SELECT 'latest', CAST({_N_APPENDS - 1} AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(30,8)))
                AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE),
           TRUE
    FROM b
    """,
)
def store_manifest_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed-log lifecycle — see module docstring."""
    import os
    import tempfile

    from vector_ai_npm_spark.io import tablelog
    from vector_ai_npm_spark.io.tablelog import append_table, read_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    tdir = tempfile.mkdtemp(prefix="tablelog_ckpt_")
    for s in range(_N_APPENDS):
        v = append_table(ev.where(F.col("event_id") % _N_APPENDS == s), tdir)
    assert v == _N_APPENDS - 1, f"append versions drifted: {v}"

    has_ckpt = os.path.exists(tablelog._checkpoint_path(tdir, 16))

    def stats(tag: str, version: int) -> DataFrame:
        df = read_table(spark, tdir, version)
        return df.agg(
            F.lit(tag).alias("tag"),
            F.lit(version).cast("bigint").alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            _DSUM("value").alias("total_value"),
            F.lit(bool(has_ckpt)).alias("checkpoint_exists"),
        )

    return (
        stats("asof_pre_ckpt", 9)
        .unionByName(stats("asof_post_ckpt", 18))
        .unionByName(stats("latest", _N_APPENDS - 1))
    )


def _routed_oracle() -> str:
    """Candidates from the SAME band SQL as the dedup_minhash_pairs
    oracle (reused verbatim — the two stay in lockstep), hydrated with
    token sets and filtered by exact jaccard distance."""
    from vector_ai_npm_spark.dedup.queries import _DUCK_TOKS

    pairs_sql = registry._ORACLES["dedup_minhash_pairs"]
    return f"""
    WITH cand AS ({pairs_sql}),
    toks AS (
      SELECT doc_id, list_distinct({_DUCK_TOKS}) AS tok_set
      FROM documents
      WHERE len({_DUCK_TOKS}) > 0
    )
    SELECT c.doc_id_a, c.doc_id_b,
           1.0 - CAST(len(list_intersect(a.tok_set, b.tok_set)) AS DOUBLE) /
                 len(list_distinct(list_concat(a.tok_set, b.tok_set)))
             AS jaccard_dist
    FROM cand c
    JOIN toks a ON c.doc_id_a = a.doc_id
    JOIN toks b ON c.doc_id_b = b.doc_id
    WHERE 1.0 - CAST(len(list_intersect(a.tok_set, b.tok_set)) AS DOUBLE) /
                len(list_distinct(list_concat(a.tok_set, b.tok_set)))
          <= 0.6
    """


def _register_routed() -> None:
    @query("dedup_near_lsh_routed", oracle=_routed_oracle())
    def dedup_near_lsh_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The scale path of mllib_lsh_pairs, hash-oracled at every sf
        (module docstring): banded candidates + exact token jaccard."""
        from vector_ai_npm_spark.dedup.queries import _banded_routed_pairs

        docs = load_table(spark, sf_dir, "documents")
        return _banded_routed_pairs(docs.select("doc_id", "text"), 0.6)


_register_routed()

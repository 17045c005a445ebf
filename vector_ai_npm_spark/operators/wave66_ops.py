"""Wave 66: IVF tombstone delete + UDTF with a TABLE argument.

* `vector_store_ivf_delete` — the missing third verb of the at-rest
  IVF lifecycle (build r4 / append r8 / compact r9-r10 / DELETE r11).
  A delete at 100 TB must not rewrite the store: retrieval.store.
  delete_ivf_vectors appends an ids-sized tombstone parquet, the read
  face (read_ivf_cells) anti-joins it out via broadcast, pruned search
  stops returning the ids immediately, and the next compaction
  PHYSICALLY purges the rows and retires exactly the tombstone files
  it pinned at entry (a delete landing mid-compaction survives to the
  next run — the wave-44 pin-at-entry discipline extended to deletes).
  The face pins: visible counts before and after compaction both equal
  total − deleted, the post-compact layout physically dropped the rows
  (raw cells scan = visible count, tombstone dir empty), and a deleted
  vector's own-embedding search no longer surfaces it.

* `udtf_table_argument` — the OTHER Spark 4 polymorphic-UDTF rung
  (wave 64 covered analyze()-time dynamic schema for scalar args):
  a table function consuming `TABLE(...) PARTITION BY lang ORDER BY
  doc_id` — per-partition streaming state in eval() + one summary row
  from terminate(), the UDTF-as-grouped-aggregator pattern (per-lang
  doc counts, char totals, and ORDER-BY-pinned first/last doc ids so
  a partition-ordering regression flips a column).  analyze()
  validates the table's shape at plan time (missing columns fail
  analysis, not mid-job).

Scale shape: the delete face is ids-sized writes + broadcast
anti-joins over the partition-pruned store; the UDTF face is one
Arrow-batched pass, shuffled once by the PARTITION BY key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


@query(
    "vector_store_ivf_delete",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE vec_id % 7 = 0) AS BIGINT)
             AS n_deleted,
           CAST(COUNT(*) FILTER (WHERE vec_id % 7 <> 0) AS BIGINT)
             AS n_visible_pre,
           CAST(COUNT(*) FILTER (WHERE vec_id % 7 <> 0) AS BIGINT)
             AS n_visible_post,
           TRUE AS purge_physical,
           TRUE AS tombstones_cleared,
           TRUE AS search_excludes_deleted
    FROM embeddings
    """,
)
def vector_store_ivf_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone-delete lifecycle contract — see module docstring.
    vec_id 42 is both APPENDED (42 % 3 = 0) and DELETED (42 % 7 = 0),
    so the search check proves tombstones shadow appended rows too."""
    import glob
    import tempfile

    from vector_ai_npm_spark.retrieval.store import (
        append_ivf_store,
        compact_ivf_appends,
        delete_ivf_vectors,
        persist_ivf_store,
        read_ivf_cells,
        search_ivf_store,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 3 != 0)
    batch = emb.where(F.col("vec_id") % 3 == 0)
    store_dir = tempfile.mkdtemp(prefix="ivf_delete_")
    persist_ivf_store(base, store_dir, nlist=8)
    append_ivf_store(batch, store_dir)

    # r12 (verdict item 6): the corpus-derived delete set goes to the
    # store as a DataFrame — no .collect() through the driver; the
    # request-sized list path stays covered by tests/test_wave66.py
    doomed = emb.where(F.col("vec_id") % 7 == 0).select("vec_id")
    qvec = list(
        emb.where(F.col("vec_id") == 42).select("embedding").first()[0]
    )
    n_deleted = delete_ivf_vectors(spark, store_dir, doomed)

    n_visible_pre = read_ivf_cells(spark, store_dir).count()
    hits = search_ivf_store(spark, store_dir, qvec, k=5, nprobe=8)
    search_ok = hits.where(F.col("vec_id") == 42).count() == 0

    compact_ivf_appends(spark, store_dir)
    n_visible_post = read_ivf_cells(spark, store_dir).count()
    # physical purge: the RAW cells layout (no anti-join) already
    # excludes the deleted rows, and the pinned tombstone files are gone
    n_raw = spark.read.parquet(f"{store_dir}/cells").count()
    tombs_left = glob.glob(f"{store_dir}/tombstones/*.parquet")

    n_total = emb.count()
    return spark.createDataFrame(
        [(
            n_total, n_deleted, n_visible_pre, n_visible_post,
            n_raw == n_visible_post, not tombs_left, search_ok,
        )],
        "n_total long, n_deleted long, n_visible_pre long, "
        "n_visible_post long, purge_physical boolean, "
        "tombstones_cleared boolean, search_excludes_deleted boolean",
    )


def make_lang_stats_udtf():
    """Per-partition summarizer over a TABLE argument (module-level
    factory so tests can register it independently): eval() folds the
    partition's rows in ORDER BY sequence, terminate() emits one
    summary row — analyze() checks the table shape at plan time."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class LangStats:
        def __init__(self) -> None:
            self._lang = None
            self._n = 0
            self._chars = 0
            self._first = None
            self._last = None

        @staticmethod
        def analyze(t: AnalyzeArgument) -> AnalyzeResult:
            if not t.isTable:
                raise ValueError("lang_stats requires a TABLE argument")
            cols = {f.name for f in t.dataType.fields}
            missing = {"lang", "doc_id", "text"} - cols
            if missing:
                raise ValueError(
                    f"lang_stats table is missing columns {sorted(missing)}"
                )
            return AnalyzeResult(
                schema=StructType()
                .add("lang", StringType())
                .add("n_docs", LongType())
                .add("total_chars", LongType())
                .add("first_doc", LongType())
                .add("last_doc", LongType())
            )

        def eval(self, row) -> None:
            self._lang = row["lang"]
            self._n += 1
            self._chars += len(row["text"] or "")
            if self._first is None:
                self._first = row["doc_id"]
            self._last = row["doc_id"]

        def terminate(self):
            if self._n:
                yield (
                    self._lang, self._n, self._chars,
                    self._first, self._last,
                )

    return LangStats


@query(
    "udtf_table_argument",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents
    GROUP BY lang
    """,
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE-argument UDTF face — see module docstring.  PARTITION BY
    lang + ORDER BY doc_id make first/last deterministic, so the
    oracle's MIN/MAX pin the partition ordering, not just the fold."""
    spark.udtf.register("lang_stats", make_lang_stats_udtf())
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    docs.createOrReplaceTempView("_udtf_tbl_docs")
    return spark.sql(
        """
        SELECT lang, n_docs, total_chars, first_doc, last_doc
        FROM lang_stats(TABLE(_udtf_tbl_docs)
                        PARTITION BY lang ORDER BY doc_id)
        """
    )

"""CCNet perplexity bucketing (wave 4): split each language's corpus
into head/middle/tail quality terciles by LM score (Wenzek et al. 2020
§4.3 — the bucketing that lets a trainer oversample the "head" of the
web).  The LM score is the repo's oracle-checked add-one bigram model
(`lm_bigram_score`); CCNet uses lower-perplexity-is-better, which maps
to higher mean transition probability here, so tile 1 (score DESC) is
the head.  Reference scope note: the reference has no curation surface;
this composes the curation + LM families.

Cross-engine determinism: the bucket is a pure rank artifact — the
score doubles are bit-identical by lm_bigram_score's oracle contract,
and (score DESC, doc_id ASC) is a total order, so ntile(3) agrees
bit-for-bit with DuckDB's unpartitioned window.

Scale design (100 TB): a per-language ntile window would put one whole
language in one task — the single-partition sort scale-breaker.  This
runs the GROUPED two-level rank decomposition (`_ntile_two_level`
generalized with a group key): per-language (min,max,count) stats
broadcast (|langs| rows), rows binned into 256 value buckets WITHIN
language, row_number per (lang, bucket) — bounded partitions — then a
per-language prefix over the |langs|×256 bucket-count frame broadcast
back.  Exactness is unchanged: bucket order refines the per-language
score order, so carry + local rank IS the language-global rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import vector_ai_npm_spark.text.queries  # noqa: F401  (registers lm oracle)
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import _ORACLES, query

_N_BINS = 256
_LM_SQL = _ORACLES["lm_bigram_score"]

_BUCKET_NAME = (
    "CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END"
)


@query(
    "curate_ppl_buckets",
    oracle=f"""
    WITH lm AS ({_LM_SQL}),
    scored AS (
      SELECT lm.doc_id, d.lang, lm.avg_bigram_p
      FROM lm JOIN documents d USING (doc_id)
      WHERE lm.n_bigrams > 0
    ),
    tiled AS (
      SELECT doc_id, lang, avg_bigram_p,
             CAST(ntile(3) OVER (PARTITION BY lang
                ORDER BY avg_bigram_p DESC, doc_id ASC) AS BIGINT) AS tile
      FROM scored
    )
    SELECT doc_id, lang, avg_bigram_p, tile,
           {_BUCKET_NAME} AS bucket
    FROM tiled
    """,
)
def curate_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language head/middle/tail LM-quality terciles — see module
    docstring.  Grouped two-level exact ntile; no per-language global
    sort."""
    from vector_ai_npm_spark.text.queries import lm_bigram_score

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = (
        lm_bigram_score(spark, sf_dir)
        .where(F.col("n_bigrams") > 0)
        .join(docs, "doc_id")
        .select("doc_id", "lang", "avg_bigram_p")
        # the rank decomposition consumes this doc-sized frame from five
        # branches (stats, bins, local ranks, bucket counts, output);
        # without truncation each branch re-derives the WHOLE bigram LM
        # (measured: 24 scans / 16 tokenizes in the analysis plan, AQE
        # reuse recovers little) — the graph_kcore localCheckpoint
        # medicine cuts it to one LM pass over a (doc_id, lang, double)
        # leaf
        .localCheckpoint(eager=True)
    )
    m = F.col("avg_bigram_p")
    stats = F.broadcast(
        scored.groupBy("lang").agg(
            F.min(m).alias("_lo"),
            F.max(m).alias("_hi"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    f = scored.join(stats, "lang")
    width = F.greatest(
        (F.col("_hi") - F.col("_lo")) / F.lit(_N_BINS), F.lit(1e-12)
    )
    # descending metric: high scores land in low buckets
    f = f.withColumn(
        "_bucket",
        F.least(
            F.floor((F.col("_hi") - m) / width), F.lit(_N_BINS - 1)
        ).cast("long"),
    )
    wloc = Window.partitionBy("lang", "_bucket").orderBy(
        m.desc(), F.col("doc_id").asc()
    )
    loc = f.withColumn("_lrank", F.row_number().over(wloc).cast("long"))
    per = f.groupBy("lang", "_bucket").agg(F.count(F.lit(1)).alias("_bn"))
    wcarry = (
        Window.partitionBy("lang")
        .orderBy(F.col("_bucket").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = per.select(
        "lang",
        "_bucket",
        F.coalesce(F.sum("_bn").over(wcarry), F.lit(0)).alias("_carry"),
    )
    ranked = loc.join(F.broadcast(carry), ["lang", "_bucket"]).withColumn(
        "_grank", F.col("_carry") + F.col("_lrank")
    )
    # closed form of SQL ntile(3) within each language
    big = F.col("_n") % 3
    size_big = F.floor(F.col("_n") / 3) + 1
    size_small = F.floor(F.col("_n") / 3)
    in_big = F.col("_grank") <= big * size_big
    tile = F.when(
        in_big, F.floor((F.col("_grank") - 1) / size_big) + 1
    ).otherwise(
        big + 1 + F.floor((F.col("_grank") - 1 - big * size_big) / size_small)
    )
    return ranked.withColumn("tile", tile.cast("long")).select(
        "doc_id",
        "lang",
        "avg_bigram_p",
        "tile",
        F.expr(_BUCKET_NAME).alias("bucket"),
    )

"""Wave 26: corrupted-payload quarantine through the real decoder.

`multimodal_decode_quarantine` — the error-handling face the decode
family was missing: at 100 TB a media pipeline ALWAYS contains bad
assets (truncated downloads, mislabeled bytes), and the correct
behavior is to QUARANTINE them into a status bucket, not to fail the
task (one poison asset would otherwise kill a 1000-executor job and
every retry).  The fixture plants two deterministic corruption
classes over the real-PNG corpus of `multimodal_decode_png`:

* ``doc_id % 20 == 0`` — the PNG signature's third byte is flipped:
  the decoder's format sniff rejects it (NotImplementedError) →
  status ``unrecognized``;
* ``doc_id % 20 == 10`` — the payload is truncated to its first half:
  chunk walk / zlib inflate fails mid-stream → status
  ``decode_error``;
* everything else decodes cleanly → status ``ok``.

The Spark face wraps `decode_pixels` in the per-asset try/except
INSIDE the Arrow batch (payloads never shuffle, failures never leave
the executor) and folds to per-status counts plus the decoded
dimension sums of the ok bucket; the DuckDB oracle derives the same
frame from the corruption rule and the sha2-chain dimension formula —
so a decoder that crashes the batch, misclassifies a corruption, or
quarantines a healthy asset flips a hashed value.

Cited parity: the reference repo has no media surface (SURVEY §0);
this extends the B30 north-star multimodal tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query


@query(
    "multimodal_decode_quarantine",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 20 = 0 THEN 'unrecognized'
                  WHEN doc_id % 20 = 10 THEN 'decode_error'
                  ELSE 'ok' END AS status,
             4 + CAST(doc_id % 5 AS INTEGER) AS w,
             5 + CAST(doc_id % 3 AS INTEGER) AS h
      FROM documents
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(CASE WHEN status = 'ok' THEN w ELSE 0 END) AS BIGINT)
             AS sum_width,
           CAST(SUM(CASE WHEN status = 'ok' THEN h ELSE 0 END) AS BIGINT)
             AS sum_height
    FROM m GROUP BY status
    """,
)
def multimodal_decode_quarantine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quarantining decode over a corpus with planted corruptions —
    see module docstring.  Map-only: encode + corrupt + decode +
    classify all inside one Arrow batch; the only shuffle carries the
    3-row status frame."""
    from collections.abc import Iterator

    import pandas as pd

    from vector_ai_npm_spark.multimodal.binary import (
        decode_pixels,
        encode_png,
    )

    docs = load_table(spark, sf_dir, "documents")
    w = (F.lit(4) + F.col("doc_id") % 5).cast("int")
    h = (F.lit(5) + F.col("doc_id") % 3).cast("int")
    chain = F.concat(
        F.sha2(F.col("text"), 256),
        F.sha2(F.concat(F.col("text"), F.lit("a")), 256),
        F.sha2(F.concat(F.col("text"), F.lit("b")), 256),
    )
    src = docs.select(
        F.col("doc_id").alias("asset_id"),
        w.alias("w"),
        h.alias("h"),
        F.encode(F.substring(chain, F.lit(1), w * h * 3), "utf-8").alias(
            "pixels"
        ),
    )

    def _classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, ww, hh, pix in zip(
                pdf["asset_id"], pdf["w"], pdf["h"], pdf["pixels"]
            ):
                png = encode_png(int(ww), int(hh), bytes(pix))
                if aid % 20 == 0:
                    png = png[:2] + bytes([png[2] ^ 0xFF]) + png[3:]
                elif aid % 20 == 10:
                    png = png[: len(png) // 2]
                try:
                    dw, dh, _ = decode_pixels(png)
                    rows.append(("ok", dw, dh))
                except NotImplementedError:
                    rows.append(("unrecognized", 0, 0))
                except Exception:
                    rows.append(("decode_error", 0, 0))
            yield pd.DataFrame(
                rows, columns=["status", "width", "height"]
            )

    out = src.mapInPandas(
        _classify, schema="status string, width long, height long"
    )
    return out.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum("width").cast("bigint").alias("sum_width"),
        F.sum("height").cast("bigint").alias("sum_height"),
    )

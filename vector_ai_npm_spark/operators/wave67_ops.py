"""Wave 67: .npy tensor shards as a first-class source/sink.

Training pipelines exchange embedding matrices as numpy shards (.npy /
.npz dumps from GPU jobs) at least as often as parquet; a 100 TB
corpus's embedding artifacts arrive as directories of fixed-dtype
shards.  `scan_npy_embeddings` closes that seam in BOTH directions
with the npy v1 format (the magic + header-dict + C-order payload
layout of the public numpy format spec — parsed with numpy itself,
no pickle):

  * SINK: one STRUCTURED .npy per Arrow batch via mapInPandas —
    dtype [('vec_id','<i8'), ('label','<i4'), ('embedding','<f4',(64,))]
    so ids ride in-band with the matrix (no sidecar to desync); shard
    size is the Arrow batch knob, the natural object-store shard shape.
  * SOURCE: spark.read.format('binaryFile') over the shard directory +
    an Arrow-batched np.load(allow_pickle=False) parse — each file is
    one task's payload, schema (vec_id, label, embedding) regardless
    of shard count.
  * CONTRACT: the parsed rows join back against the source table and
    every embedding must be BIT-EXACT (float32 → .npy f4 → float32 is
    identity); the oracle pins per-row (vec_id, label, dim,
    roundtrip_ok) — a header misparse, byte-order slip, or row
    truncation flips rows or booleans.

Scale shape: write is map-only (each batch writes its own shard),
read is file-parallel map-only; the verification join is the only
shuffle and exists for the contract, not the ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.registry import query

_DIM = 64


def write_npy_shards(emb: DataFrame, out_dir: str, dim: int = _DIM) -> int:
    """Sink: one structured .npy per Arrow batch.  Returns rows written."""
    from collections.abc import Iterator

    import pandas as pd

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os
        import uuid

        import numpy as np

        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            rec = np.empty(
                n,
                dtype=[
                    ("vec_id", "<i8"),
                    ("label", "<i4"),
                    ("embedding", "<f4", (dim,)),
                ],
            )
            rec["vec_id"] = pdf["vec_id"].to_numpy()
            rec["label"] = pdf["label"].to_numpy()
            rec["embedding"] = np.stack(
                [np.asarray(e, dtype=np.float32) for e in pdf["embedding"]]
            )
            shard = os.path.join(out_dir, f"shard-{uuid.uuid4().hex}.npy")
            with open(shard, "wb") as fh:
                np.save(fh, rec, allow_pickle=False)
            yield pd.DataFrame({"n": [n]})

    counted = emb.mapInPandas(_write, schema="n long")
    return sum(r.n for r in counted.collect())


def read_npy_shards(spark: SparkSession, in_dir: str) -> DataFrame:
    """Source: binaryFile scan + Arrow-batched np.load parse."""
    from collections.abc import Iterator

    import pandas as pd

    raw = spark.read.format("binaryFile").load(f"{in_dir}/*.npy")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np

        for pdf in batches:
            for content in pdf["content"]:
                rec = np.load(io.BytesIO(bytes(content)), allow_pickle=False)
                yield pd.DataFrame(
                    {
                        "vec_id": rec["vec_id"].astype("int64"),
                        "label": rec["label"].astype("int32"),
                        "embedding": [
                            row.astype(np.float32).tolist()
                            for row in rec["embedding"]
                        ],
                    }
                )

    return raw.select("content").mapInPandas(
        _parse,
        schema="vec_id long, label int, embedding array<float>",
    )


@query(
    "scan_npy_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(label AS INTEGER) AS label,
           CAST(len(embedding) AS BIGINT) AS dim,
           TRUE AS roundtrip_ok
    FROM embeddings
    """,
)
def scan_npy_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """.npy shard sink → source roundtrip — see module docstring."""
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    out_dir = tempfile.mkdtemp(prefix="npy_shards_")
    n = write_npy_shards(emb.repartition(4), out_dir)
    assert n == emb.count(), f"shard write dropped rows: {n}"

    parsed = read_npy_shards(spark, out_dir).select(
        "vec_id",
        F.col("label").alias("p_label"),
        F.col("embedding").alias("p_embedding"),
    )
    src = emb.select("vec_id", "label", "embedding")
    return src.join(parsed, "vec_id").select(
        "vec_id",
        "label",
        F.size("embedding").cast("bigint").alias("dim"),
        (
            (F.col("label") == F.col("p_label"))
            & (F.col("embedding") == F.col("p_embedding"))
        ).alias("roundtrip_ok"),
    )

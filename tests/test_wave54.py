"""Wave 54: Spark 4 Python DataSource (recjournal) — reader planning,
filter pushdown, writer atomicity, format framing."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from vector_ai_npm_spark.io.pyds import (
    RecJournalReader,
    read_recjournal_file,
    register_recjournal,
    write_recjournal,
)
from vector_ai_npm_spark.io.sources import load_table

SF = "/root/testdata/sf0.001"


def _journal(spark, tmp_path, shards=4):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    rows = [(r.doc_id, r.lang, r.n_chars) for r in docs.collect()]
    path = str(tmp_path / "j")
    write_recjournal(rows, path, n_shards=shards)
    return path, rows


def test_format_roundtrip_and_framing(tmp_path):
    rows = [(1, "en", 100), (2, "ünïcode", 5), (3, "", 0)]
    path = str(tmp_path / "f")
    files = write_recjournal(rows, path, n_shards=2)
    back = sorted(r for f in files for r in read_recjournal_file(f))
    assert back == sorted(rows)
    # truncation is a loud error, not silent tail loss
    with open(files[1], "rb") as fh:
        data = fh.read()
    trunc = str(tmp_path / "trunc.recj")
    with open(trunc, "wb") as fh:
        fh.write(data[:-3])
    with pytest.raises(ValueError, match="truncated"):
        list(read_recjournal_file(trunc))


def test_reader_plans_one_partition_per_shard(spark, tmp_path):
    path, rows = _journal(spark, tmp_path, shards=4)
    register_recjournal(spark)
    df = spark.read.format("recjournal").option("path", path).load()
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == len(rows)


def test_pushdown_absorbs_predicates_from_the_plan(spark, tmp_path):
    """The optimized plan must NOT contain the lang/n_chars comparisons
    — pushFilters absorbed them; only null-guards remain — and the
    result must equal the parquet-path answer."""
    path, rows = _journal(spark, tmp_path)
    register_recjournal(spark)
    df = (
        spark.read.format("recjournal").option("path", path).load()
        .where((F.col("lang") == "en") & (F.col("n_chars") > 200))
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "= en" not in plan and "> 200" not in plan, plan
    want = sum(1 for _, lang, n in rows if lang == "en" and n > 200)
    assert df.count() == want > 0


def test_pushdown_returns_residual_for_unsupported(spark, tmp_path):
    """A predicate the reader can't handle (doc_id % 2) must survive as
    a residual Filter and still produce correct results."""
    path, rows = _journal(spark, tmp_path)
    register_recjournal(spark)
    df = (
        spark.read.format("recjournal").option("path", path).load()
        .where((F.col("n_chars") > 200) & (F.col("doc_id") % 2 == 0))
    )
    want = sum(1 for d, _, n in rows if n > 200 and d % 2 == 0)
    assert df.count() == want > 0


def test_reader_unit_pushdown_contract():
    from pyspark.sql.datasource import EqualTo, GreaterThan

    r = RecJournalReader({"path": "/nonexistent"})
    residual = r.pushFilters(
        [EqualTo(("lang",), "en"), GreaterThan(("n_chars",), 10),
         EqualTo(("doc_id",), 3)]
    )
    assert [f.attribute for f in residual] == [("doc_id",)]
    assert r.lang_eq == "en" and r.chars_gt == 10


def test_distributed_writer_commit_and_no_staged_leftovers(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = str(tmp_path / "w")
    register_recjournal(spark)
    (
        docs.repartition(3).write.format("recjournal")
        .option("path", path).mode("append").save()
    )
    assert len(glob.glob(path + "/*.recj")) == 3
    assert glob.glob(path + "/*.staged") == []
    back = spark.read.format("recjournal").option("path", path).load()
    assert back.count() == docs.count()
    assert (
        back.agg(F.sum("n_chars")).first()[0]
        == docs.agg(F.sum("n_chars")).first()[0]
    )


def test_reader_errors_without_shards(tmp_path):
    r = RecJournalReader({"path": str(tmp_path)})
    with pytest.raises(ValueError, match="no .recj shards"):
        r.partitions()
    with pytest.raises(ValueError, match="path option"):
        RecJournalReader({})


def test_overwrite_clears_stale_shards_and_append_accumulates(
    spark, tmp_path
):
    """r10 advice: overwriting a directory that previously committed
    MORE shards must not leave the old higher-numbered shards behind
    (the fixed shard-%04d namespace did, and the reader glob silently
    mixed two commits).  Shards are now per-commit-UUID-prefixed:
    overwrite drops every prior-commit shard; append accumulates
    without clobbering."""
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = str(tmp_path / "ow")
    register_recjournal(spark)
    docs.repartition(5).write.format("recjournal").option(
        "path", path
    ).mode("append").save()
    assert len(glob.glob(path + "/*.recj")) == 5
    # overwrite with FEWER shards: stale shards must vanish
    docs.repartition(2).write.format("recjournal").option(
        "path", path
    ).mode("overwrite").save()
    assert len(glob.glob(path + "/*.recj")) == 2
    back = spark.read.format("recjournal").option("path", path).load()
    assert back.count() == docs.count()
    # append on top: rows double, nothing clobbered
    docs.repartition(2).write.format("recjournal").option(
        "path", path
    ).mode("append").save()
    assert len(glob.glob(path + "/*.recj")) == 4
    back2 = spark.read.format("recjournal").option("path", path).load()
    assert back2.count() == 2 * docs.count()

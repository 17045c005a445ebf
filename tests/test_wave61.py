"""Wave 61: XML source/sink round-trip details."""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F


def test_xml_sink_writes_wellformed_parts_and_reader_splits(spark):
    """The sink emits one well-formed rooted file per partition; the
    reader recovers every row element across all parts, attributes
    landing in `_`-prefixed columns."""
    df = spark.range(100).select(
        F.col("id").alias("_k"),
        (F.col("id") * 3).alias("v"),
        F.struct((F.col("id") % 5).alias("inner")).alias("nest"),
    )
    path = tempfile.mkdtemp(prefix="xmlrt_") + "/d"
    (
        df.repartition(4).write.format("xml")
        .option("rowTag", "r").option("rootTag", "rs").save(path)
    )
    parts = glob.glob(path + "/part-*")
    assert len(parts) == 4
    head = open(parts[0]).read()
    assert "<rs>" in head.split("\n", 2)[1] and head.rstrip().endswith("</rs>")
    assert head.startswith("<?xml")  # declaration precedes the root
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("_k", T.LongType()),
            T.StructField("v", T.LongType()),
            T.StructField(
                "nest", T.StructType([T.StructField("inner", T.LongType())])
            ),
        ]
    )
    back = (
        spark.read.format("xml").option("rowTag", "r")
        .schema(schema).load(path)
    )
    assert back.count() == 100
    assert back.agg(F.sum("v")).first()[0] == 3 * 4950
    assert back.agg(F.sum("nest.inner")).first()[0] == sum(
        i % 5 for i in range(100)
    )


def test_xpath_funcs_jvm_side(spark):
    df = spark.createDataFrame(
        [(1, "<a><b>7</b><b>9</b><c>x</c></a>")], "id int, x string"
    )
    out = df.select(
        F.expr("xpath(x, '/a/b/text()')").alias("bs"),
        F.expr("xpath_string(x, '/a/c')").alias("c"),
        F.expr("xpath_long(x, 'sum(/a/b)')").alias("s"),
    ).first()
    assert out.bs == ["7", "9"] and out.c == "x" and out.s == 16
    plan = (
        df.select(F.expr("xpath_string(x, '/a/c')"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    for py in ("BatchEvalPython", "ArrowEvalPython"):
        assert py not in plan

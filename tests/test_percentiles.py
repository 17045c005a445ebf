"""Contract tests for the quantile family (B10+): the approximate path
must stay within its documented rank-error bound of the exact path, and
the discrete quantile must return actual data values."""

from __future__ import annotations

from vector_ai_npm_spark import registry


def test_approx_percentile_within_rank_error(spark, sf_oracle):
    """approx_percentile(accuracy=10000) guarantees rank error ≤ ε=1e-4.
    Pin value-space at 2ε (tighter than the query's driver-facing 5ε
    band): each approx quantile must lie between the exact discrete
    quantiles at q ± 2ε."""
    exact = {
        r["l_returnflag"]: r
        for r in registry.run("agg_percentile", spark, sf_oracle).collect()
    }
    wg = "WITHIN GROUP (ORDER BY l_extendedprice)"
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.io.sources import load_table

    li = load_table(spark, sf_oracle, "lineitem")
    eps = 1e-4
    band = {"50": 0.5, "90": 0.9, "99": 0.99}
    bounds = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.expr(
                    f"percentile_disc({max(0.0, q - 2 * eps)}) {wg}"
                ).alias(f"lo{nm}")
                for nm, q in band.items()
            ],
            *[
                F.expr(
                    f"percentile_disc({min(1.0, q + 2 * eps)}) {wg}"
                ).alias(f"hi{nm}")
                for nm, q in band.items()
            ],
            F.percentile_approx(
                "l_extendedprice", list(band.values()), 10000
            ).alias("qs"),
        )
        .collect()
    }
    assert set(bounds) == set(exact)
    for flag, b in bounds.items():
        for i, nm in enumerate(band):
            a = b["qs"][i]
            assert b[f"lo{nm}"] <= a <= b[f"hi{nm}"], (
                f"{flag} p{nm} {a} outside rank bound"
            )


def test_approx_percentile_driver_face_all_ok(spark, sf_oracle):
    """The driver-checkable face: every *_ok band boolean must be TRUE
    (the oracle asserts TRUE, so false here = red driver row) and the
    exact_* columns must equal agg_percentile's discrete quantiles."""
    face = {
        r["l_returnflag"]: r
        for r in registry.run("agg_approx_percentile", spark, sf_oracle).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in registry.run("agg_percentile", spark, sf_oracle).collect()
    }
    assert set(face) == set(exact)
    for flag, r in face.items():
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"], (flag, r)
        assert r["exact_p50"] == exact[flag]["p50"]
        assert r["exact_p90"] == exact[flag]["p90"]
        assert r["exact_p99"] == exact[flag]["p99"]


def test_disc_quantiles_are_data_values(spark, sf_oracle):
    """percentile_disc must return values that exist in the column."""
    from vector_ai_npm_spark.io.sources import load_table

    rows = registry.run("agg_percentile", spark, sf_oracle).collect()
    li = load_table(spark, sf_oracle, "lineitem")
    values = {r[0] for r in li.select("l_extendedprice").distinct().collect()}
    for r in rows:
        for col in ("p50", "p90", "p99"):
            assert r[col] in values, f"{col}={r[col]} not a data value"


def test_hash_sample_is_deterministic_and_partition_independent(spark, sf_oracle):
    """Hash-threshold sampling must return the identical row set across
    runs AND across repartitionings (the property Bernoulli sample(seed)
    lacks), with size within ±30% of the 10% target."""
    from vector_ai_npm_spark import registry
    from vector_ai_npm_spark.io.sources import load_table

    a = {tuple(r) for r in registry.run("sample_ops", spark, sf_oracle).collect()}
    b = {tuple(r) for r in registry.run("sample_ops", spark, sf_oracle).collect()}
    assert a == b, "hash sample must be run-stable"

    li = load_table(spark, sf_oracle, "lineitem")
    from pyspark.sql import functions as F

    key = F.md5(
        F.concat_ws("#", F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"))
    )
    bucket = F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint") % 1000
    c = {
        tuple(r)
        for r in li.repartition(7)
        .where(bucket < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .collect()
    }
    assert c == a, "hash sample must be partitioning-independent"
    n = li.count()
    assert 0.07 * n <= len(a) <= 0.13 * n, (len(a), n)


def test_corrupt_csv_routes_bad_rows(spark, sf_oracle):
    """PERMISSIVE CSV read: good rows parse clean, planted bad rows land
    with a populated _corrupt_record instead of failing the job."""
    from vector_ai_npm_spark import registry
    from vector_ai_npm_spark.io.sources import load_table

    out = registry.run("scan_csv_corrupt", spark, sf_oracle).cache()
    n_good_src = load_table(spark, sf_oracle, "customer").count()
    # face = clean rows only, with the quarantine count as a column
    assert out.count() == n_good_src
    n_corrupt = {r.n_corrupt for r in out.select("n_corrupt").distinct().collect()}
    assert n_corrupt == {2}, "both planted corrupt rows must be quarantined"
    out.unpersist()

"""Contract tests for the quantile family (B10+): the approximate path
must stay within its documented rank-error bound of the exact path, and
the discrete quantile must return actual data values."""

from __future__ import annotations

from vector_ai_npm_spark import registry


def test_approx_percentile_within_rank_error(spark, sf_oracle):
    """approx_percentile(accuracy=10000) guarantees rank error ≤ 1/10000.
    Check value-space: each approx quantile must lie between the exact
    quantiles at p ± 1% (a far looser rank bound, immune to ties)."""
    exact = {
        r["l_returnflag"]: r
        for r in registry.run("agg_percentile", spark, sf_oracle).collect()
    }
    wg = "WITHIN GROUP (ORDER BY l_extendedprice)"
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.io.sources import load_table

    li = load_table(spark, sf_oracle, "lineitem")
    bounds = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(f"percentile_disc(0.49) {wg}").alias("lo50"),
            F.expr(f"percentile_disc(0.51) {wg}").alias("hi50"),
            F.expr(f"percentile_disc(0.89) {wg}").alias("lo90"),
            F.expr(f"percentile_disc(0.91) {wg}").alias("hi90"),
            F.expr(f"percentile_disc(0.98) {wg}").alias("lo99"),
            F.expr(f"percentile_disc(1.0) {wg}").alias("hi99"),
        )
        .collect()
    }
    approx = {
        r["l_returnflag"]: (r["approx_p50"], r["approx_p90"], r["approx_p99"])
        for r in registry.run("agg_approx_percentile", spark, sf_oracle).collect()
    }
    assert set(approx) == set(exact)
    for flag, (a50, a90, a99) in approx.items():
        b = bounds[flag]
        assert b["lo50"] <= a50 <= b["hi50"], f"{flag} p50 {a50} outside rank bound"
        assert b["lo90"] <= a90 <= b["hi90"], f"{flag} p90 {a90} outside rank bound"
        assert b["lo99"] <= a99 <= b["hi99"], f"{flag} p99 {a99} outside rank bound"


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

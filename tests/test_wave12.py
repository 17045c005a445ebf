"""Wave-12 operators: URL canonicalization, code detection, CUPED,
sketch bounds, HITS."""

from __future__ import annotations

from vector_ai_npm_spark import registry


def test_url_canonical_groups_are_real_dups(spark, sf_oracle):
    """Every emitted group must have >= 2 members and the keeper must be
    its minimum doc_id; canonical URLs must be fully normalized (no
    uppercase scheme/host, no www, no fragment, sorted query)."""
    rows = registry.run("curate_url_canonical", spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert r.n_dups >= 2
        u = r.canonical_url
        assert u.startswith("https://") and "WWW." not in u and "#" not in u
        assert ":443" not in u
        if "?" in u:
            params = u.split("?", 1)[1].split("&")
            assert params == sorted(params)


def test_code_detect_separates_planted(spark, sf_oracle):
    rows = registry.run("text_code_detect", spark, sf_oracle).collect()
    planted = [r for r in rows if r.doc_id % 10 == 0]
    prose = [r for r in rows if r.doc_id % 10 != 0]
    assert all(r.is_code for r in planted)
    assert all(not r.is_code for r in prose)
    assert all(r.syms_per_kchar == 0 for r in prose)  # word salad


def test_cuped_preserves_pooled_mean_and_reduces_variance(spark, sf_oracle):
    """CUPED must leave the POOLED mean unchanged (the adjustment is
    mean-zero by construction) and, on autocorrelated spend, pull both
    arm means toward each other or keep them — never amplify noise
    beyond the raw gap by construction of theta."""
    rows = registry.run("ab_cuped_adjust", spark, sf_oracle).collect()
    assert {r.arm for r in rows} == {"control", "treatment"}
    n = sum(r.n_users for r in rows)
    pooled_raw = sum(r.mean_y * r.n_users for r in rows) / n
    pooled_adj = sum(r.mean_y_cuped * r.n_users for r in rows) / n
    assert abs(pooled_raw - pooled_adj) < 1e-6


def test_sketch_bounds_hold(spark, sf_oracle):
    rows = registry.run(
        "agg_approx_percentile_bounds", spark, sf_oracle
    ).collect()
    assert rows and all(r.p50_rank_ok and r.p90_rank_ok for r in rows)


def test_hits_is_l1_normalized_and_positive(spark, sf_oracle):
    rows = registry.run("graph_hits", spark, sf_oracle).collect()
    assert rows
    assert all(r.authority > 0 for r in rows)
    assert abs(sum(r.authority for r in rows) - 1.0) < 1e-9


def test_sq8_codes_and_error_bound(spark, sf_oracle):
    """SQ8 (wave 13): codes integer-exact in [0,255], reconstruction
    within half a quantization step, every dim covered."""
    rows = registry.run("vector_quantize_sq8", spark, sf_oracle).collect()
    assert rows
    assert all(r.codes_in_range and r.err_ok for r in rows)
    assert len({r.n_dims for r in rows}) == 1  # uniform dim


def test_sq8_stats_are_dim_sized(spark, sf_oracle):
    """The SQ8 'codebook' must be a dim-count frame (broadcastable),
    with lo < hi on every dimension of the fixture."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.retrieval.sq import sq8_stats

    emb = load_table(spark, sf_oracle, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    stats = sq8_stats(emb).collect()
    assert len(stats) == 64
    assert all(r.lo < r.hi for r in stats)

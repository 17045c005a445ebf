"""Contracts for the scale suite: sketch accuracy/mergeability and
range-clustered layout pruning (vector_ai_npm_spark/operators/scale_suite.py).

The estimate-bearing queries are rows-only at the driver's oracle gate,
so their real guarantees live here:
  * HLL / theta estimates within 2% of the exact distinct count
  * union-of-daily-partials == single-pass sketch, EXACTLY
  * KLL quantiles within the sketch's rank-error bound vs exact ranks
  * the clustered layout actually produces disjoint per-file key ranges
    (the property footer-based pruning relies on)
"""

from __future__ import annotations

import glob

import pytest

from vector_ai_npm_spark import registry


def _rows(spark, sf, name):
    return registry.run(name, spark, sf).collect()


def test_sketch_distinct_accuracy(spark, sf_oracle):
    """Raw estimates (recomputed inline — the query face emits booleans)
    must sit within 2% of exact; the face booleans must all be TRUE."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.operators.scale_suite import _HLL_LGK

    ev = load_table(spark, sf_oracle, "events")
    raw = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", _HLL_LGK)).alias(
            "hll_users"
        ),
        F.theta_sketch_estimate(F.theta_sketch_agg("user_id")).alias(
            "theta_users"
        ),
    )
    for r in raw.collect():
        assert r.exact_users > 0
        assert abs(r.hll_users - r.exact_users) <= 0.02 * r.exact_users, r
        assert abs(r.theta_users - r.exact_users) <= 0.02 * r.exact_users, r
    for r in _rows(spark, sf_oracle, "agg_sketch_distinct"):
        assert r.hll_ok and r.theta_ok, r


def test_sketch_merge_is_lossless(spark, sf_oracle):
    rows = _rows(spark, sf_oracle, "agg_sketch_merge")
    assert rows, "no groups"
    for r in rows:
        # HLL union is register-wise max: merging daily partials must give
        # bit-identical estimates to the one-shot sketch.
        assert r.merge_lossless, r
        assert r.days_merged > 1, "merge test needs multiple partials"


def test_kll_quantiles_rank_error(spark, sf_oracle):
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.io.sources import load_table

    li = load_table(spark, sf_oracle, "lineitem")
    raw = (
        li.groupBy("l_returnflag")
        .agg(
            F.kll_sketch_agg_double("l_extendedprice").alias("sk"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            "n",
            F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
            F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("p90"),
            F.kll_sketch_get_quantile_double("sk", F.lit(0.99)).alias("p99"),
        )
    )
    got = {r.l_returnflag: r for r in raw.collect()}
    exact = li.select("l_returnflag", "l_extendedprice").toPandas()
    # KLL with default k=200 has ~1.65% rank error at 99% confidence;
    # assert a slightly looser 2.5% on the *rank* of the returned value.
    for flag, grp in exact.groupby("l_returnflag"):
        vals = grp["l_extendedprice"].sort_values().to_numpy()
        n = len(vals)
        assert got[flag].n == n
        for q, val in ((0.5, got[flag].p50), (0.9, got[flag].p90), (0.99, got[flag].p99)):
            rank = (vals <= val).sum() / n
            assert abs(rank - q) <= 0.025, (flag, q, val, rank)
    # the driver-face bands (±3% disc quantiles) must all hold
    for r in _rows(spark, sf_oracle, "agg_kll_quantiles"):
        assert r.p50_ok and r.p90_ok and r.p99_ok, r


def test_cluster_layout_files_are_disjoint(spark, sf_oracle):
    """Drive cluster_by_range directly and inspect parquet footers: each
    file must own a tight l_shipdate range, pairwise disjoint, so a
    range predicate can skip all but ~1/buckets of the data."""
    import tempfile

    pa_pq = pytest.importorskip("pyarrow.parquet")

    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.operators.scale_suite import cluster_by_range

    path = tempfile.mkdtemp(prefix="layout_test_") + "/li"
    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    cluster_by_range(li, path, ["l_shipdate", "l_orderkey"], buckets=16)

    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pa_pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "l_shipdate" and col.statistics:
                    st = col.statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        assert lo is not None, f"no l_shipdate stats in {f}"
        spans.append((lo, hi))

    assert len(spans) >= 8, f"expected ≥8 clustered files, got {len(spans)}"
    spans.sort()
    for (_, prev_hi), (nxt_lo, _) in zip(spans, spans[1:]):
        # range partitioning puts equal keys in one partition, so file
        # ranges may touch at a boundary instant but never interleave
        assert prev_hi <= nxt_lo, (prev_hi, nxt_lo)

    # a one-month predicate must be able to skip most files on min-max
    import datetime

    q_lo = datetime.datetime(1997, 3, 1)
    q_hi = datetime.datetime(1997, 4, 1)
    overlapping = [s for s in spans if not (s[1] < q_lo or s[0] >= q_hi)]
    assert len(overlapping) <= max(2, len(spans) // 4), (
        f"{len(overlapping)}/{len(spans)} files overlap one month — "
        "clustering is not selective"
    )


def test_zorder_layout_bounds_both_dimensions(spark, sf_oracle):
    """Drive cluster_by_zorder and inspect footers: every file must
    cover a tight RECTANGLE in (l_partkey, l_suppkey) — the area-sum of
    per-file bounding boxes stays a small fraction of files × the full
    grid, which is exactly what lets a 2-D box predicate skip files on
    either dimension. A partkey-only range cluster would leave each
    file's suppkey span at full width (ratio ≈ 1 in the suppkey dim)."""
    import tempfile

    pa_pq = pytest.importorskip("pyarrow.parquet")

    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.operators.scale_suite import cluster_by_zorder

    path = tempfile.mkdtemp(prefix="layout_zorder_test_") + "/li"
    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    cluster_by_zorder(li, path, "l_partkey", "l_suppkey", buckets=16)

    def _stats(md, name):
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == name and col.statistics:
                    st = col.statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        return lo, hi

    boxes = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pa_pq.ParquetFile(f).metadata
        p = _stats(md, "l_partkey")
        s = _stats(md, "l_suppkey")
        assert p[0] is not None and s[0] is not None, f"no stats in {f}"
        boxes.append((p, s))
    assert len(boxes) >= 8, f"expected ≥8 clustered files, got {len(boxes)}"

    g_p = (min(b[0][0] for b in boxes), max(b[0][1] for b in boxes))
    g_s = (min(b[1][0] for b in boxes), max(b[1][1] for b in boxes))
    full_area = (g_p[1] - g_p[0] + 1) * (g_s[1] - g_s[0] + 1)
    area_sum = sum(
        (p[1] - p[0] + 1) * (s[1] - s[0] + 1) for p, s in boxes
    )
    # perfect quadtree tiling over n files gives area_sum == full_area;
    # morton boundary straddling costs a small constant factor. A
    # one-dimensional cluster scores ≈ n_files/4 × full_area here.
    assert area_sum <= 4 * full_area, (
        f"z-order boxes cover {area_sum / full_area:.1f}× the grid over "
        f"{len(boxes)} files — not a 2-D clustering"
    )

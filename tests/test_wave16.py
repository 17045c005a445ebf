"""Wave-16 operators: independent brute-force cross-checks."""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

import duckdb

from conftest import SF_SMOKE as SF  # single source for the fixture path


def test_weighted_percentiles_match_sorted_scan(spark, sf_smoke):
    from vector_ai_npm_spark.operators.weighted_quantile import (
        agg_weighted_percentile,
    )

    rows = duckdb.sql(
        f"SELECT CAST(FLOOR(l_extendedprice*100+0.5) AS BIGINT), "
        f"CAST(FLOOR(l_quantity+0.5) AS BIGINT) "
        f"FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    by_val: Counter = Counter()
    for cents, w in rows:
        by_val[cents] += w
    total = sum(by_val.values())
    expected = {}
    for pct in (25, 50, 75, 90):
        cum = 0
        for v in sorted(by_val):
            cum += by_val[v]
            if 100 * cum >= pct * total:
                expected[pct] = v / 100.0
                break
    got = {r.pct: r for r in agg_weighted_percentile(spark, sf_smoke).collect()}
    assert set(got) == {25, 50, 75, 90}
    for pct, v in expected.items():
        assert got[pct].weighted_value == v, pct
        assert got[pct].total_w == total
    # quantiles are monotone in p
    assert (got[25].weighted_value <= got[50].weighted_value
            <= got[75].weighted_value <= got[90].weighted_value)


def test_assortativity_matches_pearson_reference(spark, sf_smoke):
    from vector_ai_npm_spark.operators.graph_assortativity import (
        graph_assortativity,
    )

    baskets = duckdb.sql(
        f"SELECT l_orderkey, list(DISTINCT l_partkey) "
        f"FROM '{SF}/lineitem.parquet' GROUP BY l_orderkey"
    ).fetchall()
    pair_w: Counter = Counter()
    for _, parts in baskets:
        for a, b in combinations(sorted(parts), 2):
            pair_w[(a, b)] += 1
    edges = [p for p, w in pair_w.items() if w >= 2]
    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    # Pearson over the symmetrized ordered pairs (each edge twice)
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    m = len(xs)
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    expected = (m * sxy - sx * sx) / (m * sxx - sx * sx)

    row = graph_assortativity(spark, sf_smoke).collect()[0]
    assert row.n_pairs == m
    assert math.isclose(row.assortativity, expected, rel_tol=1e-12)
    assert -1.0 <= row.assortativity <= 1.0

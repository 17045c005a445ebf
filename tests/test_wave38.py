"""Wave-38: grid-density clustering + streaming DLQ routing."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


def _python_cell_dbscan(points, eps=0.1, min_pts=8):
    cells = defaultdict(int)
    for x, y in points:
        cells[(math.floor(x / eps), math.floor(y / eps))] += 1
    core = {c for c, n in cells.items() if n >= min_pts}

    def key(c):
        return (c[0] + 100) * 1000 + (c[1] + 100)

    # union-find over 8-adjacent core cells
    parent = {c: c for c in core}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for c in core:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (c[0] + dx, c[1] + dy)
                if nb in core:
                    ra, rb = find(c), find(nb)
                    if ra != rb:
                        parent[max(ra, rb, key=key)] = min(ra, rb, key=key)
    comp = {c: key(find(c)) for c in core}
    clusters = defaultdict(lambda: [0, 0, 0])  # cells, core pts, border pts
    for c in core:
        cl = clusters[comp[c]]
        cl[0] += 1
        cl[1] += cells[c]
    noise_cells = noise_points = 0
    for c, n in cells.items():
        if c in core:
            continue
        adj = [
            comp[(c[0] + dx, c[1] + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (c[0] + dx, c[1] + dy) in core
        ]
        if adj:
            clusters[min(adj)][2] += n
        else:
            noise_cells += 1
            noise_points += n
    return clusters, noise_cells, noise_points


def test_grid_density_matches_python_dbscan(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "embeddings")
        .select("embedding")
        .collect()
    )
    pts = [(float(r.embedding[0]), float(r.embedding[1])) for r in rows]
    want, noise_cells, noise_points = _python_cell_dbscan(pts)
    got = registry.run("cluster_grid_density", spark, sf_oracle).collect()
    got_clusters = {
        r.cluster_id: (r.n_cells, r.n_core_points, r.n_border_points)
        for r in got
        if r.cluster_id != -1
    }
    assert got_clusters == {k: tuple(v) for k, v in want.items()}
    noise_row = [r for r in got if r.cluster_id == -1][0]
    assert (noise_row.n_cells, noise_row.n_border_points) == (
        noise_cells, noise_points,
    )
    # every input point lands somewhere exactly once
    total = sum(r.n_core_points + r.n_border_points for r in got)
    assert total == len(pts)


def test_dlq_route_contract(spark, sf_oracle):
    got = registry.run("stream_dlq_route", spark, sf_oracle).collect()[0]
    assert got.conservation_ok and got.dlq_matches_rule
    assert got.n_batches == 3
    assert got.n_input == got.n_good + got.n_dlq
    ev = load_table(spark, sf_oracle, "events")
    n_bad = ev.where(F.col("event_id") % 17 == 0).count()
    assert got.n_dlq == n_bad
    assert got.n_good == ev.count() - n_bad
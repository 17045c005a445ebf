"""Wave-35: personalized PageRank — Python replay + invariants."""

from __future__ import annotations

from collections import defaultdict

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.operators.graph_ops import copurchase_edges


def _python_ppr(edges, n_seeds=5, n_iter=3, damping=0.85):
    adj = defaultdict(list)
    for e in edges:
        adj[e.src].append(e.dst)
        adj[e.dst].append(e.src)
    deg = {u: len(v) for u, v in adj.items()}
    seeds = sorted(deg, key=lambda u: (-deg[u], u))[:n_seeds]
    r = {s: 1.0 / n_seeds for s in seeds}
    for _ in range(n_iter):
        nxt = defaultdict(float)
        for u, ru in r.items():
            share = ru / deg[u]
            for v in adj[u]:
                nxt[v] += damping * share
        for s in seeds:
            nxt[s] += (1 - damping) / n_seeds
        r = dict(nxt)
    return r, set(seeds)


def test_ppr_matches_python_replay(spark, sf_oracle):
    edges = copurchase_edges(spark, sf_oracle).collect()
    want, seeds = _python_ppr(edges)
    got = {
        r.node: r.ppr
        for r in registry.run(
            "graph_pagerank_personalized", spark, sf_oracle
        ).collect()
    }
    assert set(got) == set(want)
    for node, v in want.items():
        # python accumulates in neighbor order, engines fold exact-
        # decimal — equal up to fold-order noise
        assert abs(got[node] - v) < 1e-9, node


def test_ppr_invariants(spark, sf_oracle):
    edges = copurchase_edges(spark, sf_oracle).collect()
    _, seeds = _python_ppr(edges)
    rows = registry.run(
        "graph_pagerank_personalized", spark, sf_oracle
    ).collect()
    total = sum(r.ppr for r in rows)
    # no dangling nodes + teleport-to-seeds ⇒ mass stays exactly 1
    assert abs(total - 1.0) < 1e-9
    by_node = {r.node: r.ppr for r in rows}
    # every seed retains teleport mass
    for s in seeds:
        assert by_node[s] >= 0.15 / 5
    # locality: rank mass only on reached nodes (no zero-rank rows)
    assert all(r.ppr > 0 for r in rows)
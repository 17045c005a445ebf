"""Wave-25 operators: knn curve and repeat cohorts — re-derived
against driver-side references."""

from __future__ import annotations

from collections import Counter, defaultdict
from fractions import Fraction

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table
from vector_ai_npm_spark.operators.graph_ops import copurchase_edges


def test_knn_curve_matches_adjacency_reference(spark, sf_oracle):
    """k_nn(k) re-derived from the collected edge list: per degree
    class, the exact fraction Σ nbr-degree / (k·n_k)."""
    edges = copurchase_edges(spark, sf_oracle).collect()
    adj = defaultdict(set)
    for e in edges:
        adj[e.src].add(e.dst)
        adj[e.dst].add(e.src)
    deg = {u: len(vs) for u, vs in adj.items()}
    per_k_nodes = Counter(deg.values())
    per_k_sum = Counter()
    for u, vs in adj.items():
        per_k_sum[deg[u]] += sum(deg[v] for v in vs)
    got = {
        r.k: r
        for r in registry.run("graph_knn_curve", spark, sf_oracle).collect()
    }
    assert set(got) == set(per_k_nodes)
    for k, n_k in per_k_nodes.items():
        r = got[k]
        assert (r.n_nodes, r.sum_nbr_deg) == (n_k, per_k_sum[k])
        assert Fraction(r.sum_nbr_deg, r.knn_den) == Fraction(
            per_k_sum[k], k * n_k
        )
        # every neighbor has degree >= 1, so knn(k) >= 1
        assert r.knn >= 1.0


def test_repeat_cohorts_match_per_customer_reference(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders")
    per_cust = defaultdict(list)
    for r in orders.select("o_custkey", "o_orderdate").collect():
        per_cust[r.o_custkey].append(r.o_orderdate)
    cohorts = defaultdict(lambda: [0, 0, 0])  # n_cust, n_repeat, orders
    for dates in per_cust.values():
        first = min(dates)
        cohort = first.date().replace(day=1) if hasattr(
            first, "date"
        ) else first.replace(day=1)
        acc = cohorts[cohort]
        acc[0] += 1
        acc[1] += 1 if len(dates) >= 2 else 0
        acc[2] += len(dates)
    got = {
        r.cohort: r
        for r in registry.run(
            "orders_repeat_cohorts", spark, sf_oracle
        ).collect()
    }
    assert set(got) == set(cohorts)
    total_customers = sum(a[0] for a in cohorts.values())
    assert total_customers == len(per_cust)  # cohorts partition customers
    for cohort, (n, rep, tot) in cohorts.items():
        r = got[cohort]
        assert (r.n_customers, r.n_repeat, r.total_orders) == (n, rep, tot)
        assert r.repeat_rate == rep / n
        assert r.orders_per_customer == tot / n

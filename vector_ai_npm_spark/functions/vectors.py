"""Native (JVM-side) vector math over ARRAY<FLOAT/DOUBLE> columns.

These compile to Catalyst ``HigherOrderFunction`` expressions inside
whole-stage codegen — no Python boundary, no UDF serialization. At 100 TB
the dot product is the inner loop of similarity search; keeping it JVM-side
is the difference between scan-speed and 10-100x slower Arrow round-trips.

Reference parity: the reference delegates cosine ranking to pgvector inside
Postgres (vector-client.ts:402-404). Here the equivalent expression runs
inside the engine itself.

Float discipline for oracle parity: elements are cast to DOUBLE before any
multiply, and the reduction is a strict left fold over array order — DuckDB
``list_dot_product``/manual ``list_sum(list_transform(...))`` fold the same
way, giving bit-identical doubles on identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double_array(c: Column) -> Column:
    return c.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a strict left-fold (order-deterministic)."""
    prods = F.zip_with(_to_double_array(a), _to_double_array(b),
                       lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    arr = _to_double_array(a)
    sq = F.transform(arr, lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) = a·b / (‖a‖‖b‖); NULL on zero-norm inputs."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def o_cosine(a_expr: str, b_expr: str) -> str:
    """DuckDB mirror of :func:`cosine_similarity` with the same fold order.

    Spelled manually (not ``list_cosine_similarity``) so the arithmetic —
    per-element double multiply, left-fold add, sqrt, divide — matches
    Spark's bit-for-bit.
    """
    def dot(x: str, y: str) -> str:
        # list_reduce is a strict left fold like Spark's aggregate();
        # prepend 0.0 so the fold starts from the same zero accumulator
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(list_zip({x}, {y}), "
            f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
            f"(acc, v) -> acc + v)"
        )

    return (
        f"({dot(a_expr, b_expr)} / "
        f"(sqrt({dot(a_expr, a_expr)}) * sqrt({dot(b_expr, b_expr)})))"
    )

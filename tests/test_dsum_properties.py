"""Property tests for functions/numeric.py::dsum — the exactness
primitive every float-valued oracle in the repo rides on.

Pins the two load-bearing claims from the module docstring:
1. partition-order independence: the same rows folded under different
   partitionings produce BIT-IDENTICAL doubles (plain SUM(double)
   would not);
2. the result equals the Python-Decimal reference: quantize each
   double's shortest repr to 8 dp (HALF_UP, matching Spark's
   BigDecimal cast), sum exactly, convert once to float.
"""

from __future__ import annotations

import decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_Q = decimal.Decimal("1e-8")


def _reference(values: list[float]) -> float:
    with decimal.localcontext() as ctx:
        ctx.prec = 60
        total = sum(
            decimal.Decimal(repr(v)).quantize(_Q, decimal.ROUND_HALF_UP)
            for v in values
        )
    return float(total)


# stay inside the documented |x| <= 1e9 identity envelope
_vals = st.lists(
    st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=40,
)


@given(_vals, st.sampled_from([1, 3, 7]))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dsum_is_partition_invariant_and_matches_decimal(spark, vals, parts):
    from pyspark.sql import functions as F

    from vector_ai_npm_spark.functions.numeric import dsum

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    one = df.repartition(1).agg(dsum("x", "s")).collect()[0].s
    many = df.repartition(parts).agg(dsum("x", "s")).collect()[0].s
    assert one == many  # bit-identical under any partitioning
    assert one == _reference(vals)
    # contrast: plain double sums are NOT order-stable in general, which
    # is the entire reason dsum exists — only sanity-check magnitude
    plain = df.agg(F.sum("x")).collect()[0][0]
    assert abs(plain - one) < 1e-4 * max(1.0, abs(one))

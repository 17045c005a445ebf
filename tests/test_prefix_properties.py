"""Property tests for functions/prefix.py::cum_before — the shared
two-level bucketed prefix must equal a naive global exclusive cumsum
on arbitrary (key, weight) frames, for any bucket width."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _naive(rows):
    out = {}
    acc = 0
    for k, w in sorted(rows):
        out[k] = acc
        acc += w
    return out


@st.composite
def _frames(draw):
    keys = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=1,
            max_size=40,
            unique=True,
        )
    )
    weights = draw(
        st.lists(
            st.integers(min_value=0, max_value=1_000_000),
            min_size=len(keys),
            max_size=len(keys),
        )
    )
    width = draw(st.sampled_from([1, 7, 100, 4096, 10**9]))
    return list(zip(keys, weights)), width


@given(_frames())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cum_before_equals_global_cumsum(spark, case):
    from vector_ai_npm_spark.functions.prefix import cum_before

    rows, width = case
    df = spark.createDataFrame(rows, "k long, w long")
    got = {
        r.k: r.cum_before
        for r in cum_before(df, "k", "w", width).collect()
    }
    assert got == _naive(rows)

"""Property tests for the wave-21 floor micro-ledger idiom.

The idiom (`FLOOR(x·10⁶ + ½)` folded as int64) exists because the
decimal scale-8 cast is NOT engine-identical on binary-exact halves
(TUNING round-8 entry, measured on attribution_time_decay).  These
tests pin both sides executable-y: the ledger agrees with Python's
exact floor under DuckDB for arbitrary doubles, and the decimal-cast
divergence REPRODUCES on the measured credit value — if either engine
changes rounding behavior, the assumption shift surfaces here first.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_EVEN, ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _credit_like(draw):
    """Doubles shaped like the attribution credits: value·w/sw with
    2-decimal values and small integer weights — the population where
    the decimal-tie bug lived."""
    cents = draw(st.integers(min_value=0, max_value=10_000_00))
    w = draw(st.integers(min_value=1, max_value=64))
    sw = draw(st.integers(min_value=1, max_value=512))
    return (cents / 100) * w / max(w, sw)


@settings(max_examples=300, deadline=None)
@given(_credit_like())
def test_duckdb_floor_ledger_matches_python(x: float) -> None:
    """FLOOR(x·10⁶+½) is the same int64 in DuckDB and CPython — both
    are correctly-rounded IEEE ops + exact floor, no decimal rounding
    mode anywhere (the Spark side is pinned transitively by the
    attribution_time_decay oracle parity)."""
    # CAST the literal: a bare float literal parses as exact DECIMAL in
    # DuckDB, which is NOT the operator's situation (value is a DOUBLE
    # column) — found by this very test's first run
    got = duckdb.sql(
        f"SELECT CAST(FLOOR(CAST({x!r} AS DOUBLE) * 1000000 + 0.5)"
        " AS BIGINT)"
    ).fetchone()[0]
    assert got == math.floor(x * 1_000_000 + 0.5)


def test_decimal_cast_tie_divergence_reproduces() -> None:
    """The measured failure the ledger replaces: 0.557890625's
    SHORTEST repr ends exactly at the scale-8 half-way point, but the
    true binary double is a hair BELOW it — so Spark (HALF_UP on the
    shortest repr) rounds UP to …63 while DuckDB (rounding the exact
    binary value, mode irrelevant) rounds DOWN to …62."""
    x = 0.557890625
    assert Decimal(str(x)) > Decimal(x)  # repr sits above the binary value
    q = Decimal("0.00000001")
    spark_style = Decimal(str(x)).quantize(q, ROUND_HALF_UP)
    for mode in (ROUND_HALF_UP, ROUND_HALF_EVEN):
        duck_style = Decimal(x).quantize(q, mode)
        assert spark_style - duck_style == Decimal("0.00000001")
    # the ledger is immune: floor acts on the double itself, whose
    # value·10⁶ product both engines compute identically
    assert math.floor(x * 1_000_000 + 0.5) == 557891


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10**15))
def test_varchar_bridge_is_correctly_rounded(n: int) -> None:
    """The eval_regression_metrics SST path: DECIMAL → VARCHAR →
    DOUBLE in DuckDB equals CPython's int → float conversion (both
    correctly rounded), including past 2⁵³ where the DIRECT decimal →
    double cast double-rounds (functions/numeric.py::o_dsum)."""
    got = duckdb.sql(
        f"SELECT CAST(CAST(CAST({n} AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)"
    ).fetchone()[0]
    assert got == float(n)

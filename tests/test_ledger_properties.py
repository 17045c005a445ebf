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
import struct
from decimal import ROUND_HALF_EVEN, ROUND_HALF_UP, Decimal

import duckdb
import pyarrow as pa
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
    attribution_time_decay oracle parity).

    The value reaches DuckDB as an Arrow DOUBLE column — the exact
    bits, just like the parquet scan in the real oracle harness.  It
    must NOT travel as a repr literal in SQL text: DuckDB's
    string→DOUBLE parse is not correctly rounded (see the pinned
    negative test below), which is a property of literal parsing, not
    of the ledger idiom.  Round-8 counterexample 948.8346874999999 is
    covered by the Hypothesis database plus the explicit regression in
    test_duckdb_string_parse_is_not_correctly_rounded.
    """
    tbl = pa.table({"x": pa.array([x], type=pa.float64())})
    con = duckdb.connect()
    con.register("t", tbl)
    got = con.sql(
        "SELECT CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT) FROM t"
    ).fetchone()[0]
    con.close()
    assert got == math.floor(x * 1_000_000 + 0.5)


def test_duckdb_string_parse_is_not_correctly_rounded() -> None:
    """Pinned NEGATIVE example (round-8 Hypothesis find): DuckDB's
    string→DOUBLE literal parse of '948.8346874999999' lands 1 ulp
    ABOVE CPython's correctly-rounded float() (…d70a vs …d709), so a
    repr-literal interpolated into oracle SQL can floor differently at
    half-points.  This is why NO oracle builder may f-string a Python
    float into DuckDB SQL — values must travel via parquet or Arrow
    (binary-exact).  If DuckDB ever fixes its parser, this test will
    fail and the restriction can be revisited."""
    x = 948.8346874999999
    parsed = duckdb.sql(f"SELECT CAST({x!r} AS DOUBLE)").fetchone()[0]
    assert struct.pack(">d", x).hex().endswith("d709")
    assert struct.pack(">d", parsed).hex().endswith("d70a")
    assert parsed != x
    # on the binary-bits path the very same value is engine-identical
    tbl = pa.table({"x": pa.array([x], type=pa.float64())})
    con = duckdb.connect()
    con.register("t", tbl)
    got = con.sql(
        "SELECT CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT) FROM t"
    ).fetchone()[0]
    con.close()
    assert got == math.floor(x * 1_000_000 + 0.5) == 948_834_687


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


def test_exact_expansion_literals_parse_exactly() -> None:
    """Every float constant an oracle builder interpolates into DuckDB
    SQL must survive the string→DOUBLE parse bit-exactly.  The nDCG
    discounts travel as exact decimal expansions
    (retrieval/queries.py::_exact_double_literal — a double's exact
    expansion is finite and parses exactly even in a not-correctly-
    rounded parser); the remaining audited float constants
    (Benford probabilities, thresholds) have shortest reprs that parse
    exactly today — this test turns any future drift (new constant,
    DuckDB parser change) into a loud failure instead of a silent
    1-ulp oracle divergence."""
    from vector_ai_npm_spark.retrieval.queries import (
        _EVAL_DISCOUNTS,
        _EVAL_IDCG,
        _exact_double_literal,
    )
    from vector_ai_npm_spark.operators.curation_dq import _BENFORD_P

    con = duckdb.connect()
    for v in list(_EVAL_DISCOUNTS) + list(_EVAL_IDCG):
        got = con.sql(f"SELECT {_exact_double_literal(v)}").fetchone()[0]
        assert got == v, f"exact expansion of {v!r} misparsed"
    for v in _BENFORD_P.values() if isinstance(_BENFORD_P, dict) else _BENFORD_P:
        if isinstance(v, float):
            got = con.sql(f"SELECT CAST({v!r} AS DOUBLE)").fetchone()[0]
            assert got == v, f"shortest repr of {v!r} misparsed — convert to exact expansion"
    con.close()


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

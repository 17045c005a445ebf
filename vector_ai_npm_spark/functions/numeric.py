"""Order-independent float aggregation helpers.

Double summation is not associative: Spark (partial aggregates across 32+
partitions) and DuckDB (single-threaded scan here) would produce sums that
differ in the last bits, failing the driver's exact value-hash compare.

Fix: cast each value to an exact DECIMAL before summing. Decimal addition
is exact and order-independent, so both engines produce identical digits;
a final cast to DOUBLE yields bit-identical IEEE values. The same pattern
works at 100 TB — Spark's decimal sum is still a single-pass partial
aggregate (map-side combine + one shuffle), just with exact arithmetic.

Oracle-side mirror (DuckDB SQL)::

    CAST(CAST(CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DECIMAL(38,8)) AS VARCHAR) AS DOUBLE)

is spelled by :func:`o_dsum` so Spark and SQL always agree on precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 8 fractional digits captures the fixtures' value scale exactly enough
# that the per-row double→decimal rounding is identical in both engines;
# 30 integer+fraction digits leaves headroom for 100 TB row counts.
#
# MAGNITUDE BOUND: the per-row double→decimal cast is only engine-
# identical while |x| ≲ 1e9.  Spark casts via the double's SHORTEST
# string repr (BigDecimal.decimal → Double.toString, ~17 significant
# digits) then rounds to scale 8; DuckDB rounds the EXACT binary value.
# Once integer digits exceed ~9, the 8 fractional digits fall below the
# shortest-repr resolution and the two roundings diverge (found by
# window_twap's µs-weighted products at ~1e12 — 3-ulp result drift).
# Normalize big factors BEFORE the fold (e.g. weight in seconds, not
# microseconds) so every summand stays under the bound.
_PREC = 30
_SCALE = 8
_DEC = f"decimal({_PREC},{_SCALE})"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact, order-independent sum of a double column, as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast(_DEC).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum / count, in doubles."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast(_DEC).cast("double") / F.count(c).cast("double")
    return out.alias(alias) if alias else out


def o_dsum(expr: str) -> str:
    """DuckDB SQL mirror of :func:`dsum` for oracle strings.

    The final decimal→double hop goes THROUGH VARCHAR: DuckDB's direct
    DECIMAL(38,8)→DOUBLE divides the int128 payload by 10^scale in
    floating point, which double-rounds once the payload exceeds 2^53
    (any sum ≳ 9e7 at scale 8). The decimal→string→double path is exact
    (full-precision decimal print + correctly-rounded strtod), matching
    Spark's BigDecimal.doubleValue. Found by the sf0.1 parity sweep —
    sf0.01 sums were small enough to fit 2^53 and never showed it.
    """
    return (
        f"CAST(CAST(CAST(SUM(CAST(({expr}) AS DECIMAL({_PREC},{_SCALE}))) "
        f"AS DECIMAL(38,{_SCALE})) AS VARCHAR) AS DOUBLE)"
    )


def o_davg(expr: str) -> str:
    """DuckDB SQL mirror of :func:`davg`."""
    return f"({o_dsum(expr)} / CAST(COUNT({expr}) AS DOUBLE))"


_GRID = 100000000.0  # 1e-8 quantization grid (matches the _DEC scale)


def davg_grid(col: Column | str, alias: str | None = None) -> Column:
    """Tie-free order-independent mean for FLOAT32-SOURCED doubles.

    :func:`davg`'s DECIMAL(30,8) cast rounds the 8th-decimal tie, and
    float32 values are dyadic rationals that genuinely land on those
    ties (1/512 = 0.001953125) — Spark and DuckDB round them in
    opposite directions (r11 sf1 sweep catch).  Quantizing with
    floor(v·1e8 + 0.5) is tie-free: both engines compute the SAME IEEE
    double and floor is exact, so per-sample integers and their sums
    are engine-identical by construction, at the same 1e-8 grid."""
    c = F.col(col) if isinstance(col, str) else col
    q = F.floor(c * F.lit(_GRID) + F.lit(0.5)).cast("bigint")
    out = (
        F.sum(q).cast("bigint").cast("double")
        / F.count(c).cast("bigint")
        / F.lit(_GRID)
    )
    return out.alias(alias) if alias else out


def o_davg_grid(expr: str) -> str:
    """DuckDB SQL mirror of :func:`davg_grid`."""
    return (
        f"(CAST(CAST(SUM(CAST(FLOOR({expr} * 100000000.0 + 0.5) AS BIGINT))"
        f" AS BIGINT) AS DOUBLE) / CAST(COUNT({expr}) AS BIGINT)"
        " / 100000000.0)"
    )

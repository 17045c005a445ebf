"""Local replica of the driver's DuckDB-oracle gate.

Runs a registered Spark query and its oracle SQL side by side, then
compares row count, column names, and order-insensitive values EXACTLY
(no float tolerance) — if this passes, any reasonable value-hash the
driver computes also matches.

Normalization: columns sorted by name, rows sorted by their stringified
tuple; values stringified with repr-level float precision.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written dir (e.g. /tmp/sf1)
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_value(v):
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return f"f:{v!r}"
    if isinstance(v, _dt.datetime):
        return f"ts:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_norm_value(v[k])}" for k in sorted(v)) + "}"
    return f"{type(v).__name__}:{v}"


def driver_canon_problems(cols: list[str], rows: list[tuple]) -> list[str]:
    """Mimic the DRIVER's canonicalizer failure mode (round-1 red rows).

    The driver sorts the result with a pandas lexsort
    (``DataFrame.sort_values`` over every column), which raises
    ``TypeError: unhashable type`` when any cell is a list / dict /
    ndarray.  Our own ``_norm_value`` stringifies such values, so a query
    can pass locally yet produce a driver error row.  This check makes
    the local gate at least as strict as the driver's.
    """
    problems: list[str] = []
    for i, c in enumerate(cols):
        for r in rows:
            v = r[i]
            if v is None:
                continue
            if isinstance(v, (list, tuple, set, dict, bytearray)) or (
                type(v).__module__ == "numpy" and getattr(v, "ndim", 0) > 0
            ):
                problems.append(
                    f"column {c!r} holds unhashable {type(v).__name__} values "
                    "— the driver canonicalizer will crash; serialize to "
                    "string (array_join/to_json) or explode to rows"
                )
                break
    return problems


def _normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def run_spark_query(spark, name: str, sf_dir: str):
    from vector_ai_npm_spark import registry

    df = registry.run(name, spark, sf_dir)
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def run_oracle(con, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def compare(spark, name: str, sql: str, sf_dir: str) -> list[str]:
    """Returns a list of human-readable mismatch descriptions (empty = pass)."""
    s_cols, s_rows = run_spark_query(spark, name, sf_dir)
    con = duckdb_connect(sf_dir)
    try:
        o_cols, o_rows = run_oracle(con, sql)
    finally:
        con.close()

    problems: list[str] = driver_canon_problems(s_cols, s_rows)
    if problems:
        return problems
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    s_norm = _normalize(s_cols, s_rows)
    o_norm = _normalize(o_cols, o_rows)
    if s_norm != o_norm:
        diffs = 0
        for a, b in zip(s_norm, o_norm):
            if a != b:
                problems.append(f"  row diff:\n    spark : {a}\n    oracle: {b}")
                diffs += 1
                if diffs >= 5:
                    problems.append("  ... (more diffs suppressed)")
                    break
        if not diffs and len(s_norm) != len(o_norm):
            pass
        problems.insert(0, "value mismatch")
    return problems

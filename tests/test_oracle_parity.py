"""The local correctness gate: every registered query with an oracle must
match DuckDB exactly at sf0.01 — same check shape as the driver's
CORRECTNESS_r{N}.json run. Queries without an oracle get a rows-run smoke.
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare

from vector_ai_npm_spark import registry

_QUERIES = registry.all_queries()
_ORACLES = registry.all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, sf_oracle, name):
    problems = compare(spark, name, _ORACLES[name], sf_oracle)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, sf_oracle, name):
    df = registry.run(name, spark, sf_oracle)
    assert df.count() >= 0

from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from vector_ai_npm_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    s = get_spark("vector-ai-npm-spark-tests", cpus=cpus, shuffle_partitions=16)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    # override to sweep parity at another scale, e.g.
    # SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.1 pytest tests/test_oracle_parity.py
    return os.environ.get("SPARK_GRAFT_PARITY_SF", SF_ORACLE)

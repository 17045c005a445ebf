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
    """Rows-only queries still go through the driver's canonicalizer
    (round 1 proved it runs BEFORE the oracle lookup), so their output
    must be canonicalizable too — no array/map/struct cells."""
    from tests.oracle_harness import driver_canon_problems

    df = registry.run(name, spark, sf_oracle)
    rows = [tuple(r) for r in df.collect()]
    problems = driver_canon_problems(list(df.columns), rows)
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_multimodal_decode_stub_contract(spark, sf_oracle):
    """The real decoder is a stubbed codec boundary: it must raise
    NotImplementedError (not silently fake) unless fake_decoder=True."""
    import pytest as _pytest

    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.multimodal.binary import extract_features, synth_media

    media = synth_media(load_table(spark, sf_oracle, "documents"))
    with _pytest.raises(Exception) as ei:
        extract_features(media, fake_decoder=False).limit(1).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )

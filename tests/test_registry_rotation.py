"""The driver checks only the first 50 queries per round; registry order
is therefore a rotation schedule derived from past CORRECTNESS_r*.json
files.  Pin the three-tier sort: previously-failed first, then
never-attempted, then driver-green."""

from __future__ import annotations

import json

from vector_ai_npm_spark import registry


def test_driver_history_tiers(monkeypatch, tmp_path):
    rows = {
        "green_q": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        },
        "red_q": {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "err": "TypeError: boom",
        },
        "rows_only_q": {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": 7,
            "err": "no_oracle",
        },
        "flipped_q": {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": 7,
            "err": "no_oracle",
        },
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    monkeypatch.setattr(
        registry.Path,
        "glob",
        lambda self, pat: iter([tmp_path / "CORRECTNESS_r01.json"]),
    )
    # flipped_q has since gained an oracle: its old rows-only pass no
    # longer counts and it must be re-verified under the hash gate.
    monkeypatch.setitem(registry._ORACLES, "flipped_q", "SELECT 1")
    verified, attempted = registry._driver_history()
    assert "green_q" in verified
    assert "rows_only_q" in verified
    assert "red_q" in attempted and "red_q" not in verified
    assert "flipped_q" in attempted and "flipped_q" not in verified


def test_window_prioritizes_unverified():
    qs = list(registry.all_queries())
    verified, attempted = registry._driver_history()
    window, rest = qs[:50], qs[50:]
    # No driver-green query may hold a window slot while any unverified
    # query sits outside the window.
    unverified_outside = [n for n in rest if n not in verified]
    if unverified_outside:
        assert all(n not in verified for n in window)
    # Previously-failed queries re-enter the next window immediately.
    failed = [n for n in registry.all_queries() if n in attempted and n not in verified]
    for name in failed:
        assert name in window


def test_rotation_is_deterministic():
    assert list(registry.all_queries()) == list(registry.all_queries())

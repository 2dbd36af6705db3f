"""Run every gated query against its DuckDB oracle — the same check the
driver performs at sf0.01, executed locally at sf0.001 on each test run.
Parametrized so a failure names the exact query."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle

import __spark_entry__ as entrymod


def _names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        # rows-only check (non-SQL-expressible op): must run and be stable
        df = q(spark, SF_DIR)
        assert df.count() >= 0
        return
    assert_matches_oracle(q(spark, SF_DIR), duck, oracles[name])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0

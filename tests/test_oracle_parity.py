"""Run every ``queries()`` entry against its DuckDB oracle at sf0.001 —
the same check the driver performs at sf0.01 (CORRECTNESS_r{N}.json),
kept fast enough for the inner loop."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_utils import assert_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_an_oracle_or_is_flagged():
    # every declared query should have an oracle unless it is a
    # documented non-SQL-expressible op
    missing = set(QUERIES) - set(ORACLES)
    assert missing <= getattr(entry_mod, "NON_SQL_QUERIES", set()), missing


@pytest.mark.parametrize("name", sorted(set(QUERIES) & set(ORACLES)))
def test_query_matches_oracle(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    assert_matches_oracle(df, ORACLES[name], sf_small)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0

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


def test_gopher_flags_kill_each_rule(spark):
    """Each Gopher rule fires independently on a purpose-built doc."""
    from kafka_sparkstreaming_sbt_spark.operators.text import (
        gopher_quality_flags,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and then the dog sat too"),  # ok
            (2, "short the text"),  # too few words
            (3, "the " + "supercalifragilistic " * 9 + "of"),  # mean len
            (4, "cat dog bird fish cow horse goat sheep pig duck"),  # stop
            (5, "the # " + "# " * 8 + "cat and the dog"),  # symbols
            (6, "the 1 2 3 4 5 6 7 8 and"),  # alpha
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in gopher_quality_flags(
            docs, min_words=10, min_stop_hits=2
        ).collect()
    }
    assert out[1].keep
    assert not out[2].words_ok and not out[2].keep
    assert not out[3].mean_len_ok and not out[3].keep
    assert not out[4].stop_ok and not out[4].keep
    assert not out[5].symbol_ok and not out[5].keep
    assert not out[6].alpha_ok and not out[6].keep
    # filter form keeps full rows of survivors only
    from kafka_sparkstreaming_sbt_spark.operators.text import gopher_filter

    kept = gopher_filter(docs, min_words=10, min_stop_hits=2)
    assert [r.doc_id for r in kept.collect()] == [1]
    assert kept.columns == ["doc_id", "text"]

"""Broadcast Bloom-filter corpus screen (operators/bloom.py): exact
semantics vs a plain anti-join, measured false-positive rate against
the sized target, bitmap determinism across partitionings, the
broadcast-budget guard, and the map-only batch plan.  The gate query
``bloom_screened_docs`` hash-matches a plain NOT IN DuckDB oracle in
the registry sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.bloom import (
    bloom_params,
    bloom_screen,
    build_bloom,
    with_bloom_flag,
)


@pytest.fixture(scope="module")
def keyed(spark):
    corpus = spark.range(0, 5000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("key")
    )
    batch = spark.range(4000, 6000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("key")
    )
    return corpus, batch


def test_params_match_textbook_sizing():
    n_bits, n_hashes = bloom_params(5000, 0.01)
    # m = -n ln p / ln2^2 = 47925.1 -> byte-rounded; k = m/n ln2 = 7
    assert n_bits == 47928
    assert n_hashes == 7
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(100, 1.5)


def test_screen_is_exactly_the_anti_join(keyed):
    corpus, batch = keyed
    got = sorted(
        r["key"]
        for r in bloom_screen(
            batch, corpus, "key", expected_items=5000
        ).collect()
    )
    exp = sorted(
        r["key"] for r in batch.join(corpus, "key", "left_anti").collect()
    )
    assert got == exp
    assert len(got) == 1000  # 5000..5999


def test_no_false_negatives_and_fpp_near_target(keyed, spark):
    corpus, _ = keyed
    bloom = build_bloom(corpus, "key", 5000, fpp=0.01)
    # every corpus key must test positive (no false negatives)
    member = with_bloom_flag(corpus, "key", bloom)
    assert member.filter(~F.col("bloom_maybe")).count() == 0
    # disjoint keys positive at ~fpp (3x slack for sampling noise)
    disjoint = spark.range(0, 20000).select(
        F.concat(F.lit("x-"), F.col("id")).alias("key")
    )
    fp = (
        with_bloom_flag(disjoint, "key", bloom)
        .filter(F.col("bloom_maybe"))
        .count()
    )
    assert fp / 20000 < 0.03


def test_bitmap_deterministic_across_partitionings(keyed):
    corpus, _ = keyed
    a = build_bloom(corpus, "key", 5000, fpp=0.01)
    b = build_bloom(corpus.repartition(17), "key", 5000, fpp=0.01)
    assert a == b


def test_empty_corpus_admits_everything(keyed, spark):
    corpus, batch = keyed
    out = bloom_screen(
        batch,
        corpus.filter(F.lit(False)),
        "key",
        expected_items=10,
    )
    assert out.count() == batch.count()


def test_broadcast_budget_guard(keyed):
    corpus, _ = keyed
    with pytest.raises(ValueError, match="broadcast budget"):
        build_bloom(
            corpus, "key", 10**9, fpp=0.001, max_bitmap_bytes=1 << 20
        )


def test_membership_test_is_map_only(keyed):
    """The batch-side flag plan must contain no shuffle: scan ->
    codegen'd hashes -> one Arrow pass."""
    corpus, batch = keyed
    bloom = build_bloom(corpus, "key", 5000, fpp=0.01)
    plan = (
        with_bloom_flag(batch, "key", bloom)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInArrow" in plan

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


def test_fan_in_spreads_over_multiple_groups(keyed):
    """The tree-reduce fan key must distribute per-partition bitmaps
    over >1 fan group for a multi-partition input — a degenerate
    single group would np.stack-materialize all P bitmaps in one OR
    task, voiding the documented memory bound.  (Regression: a
    monotonically_increasing_id-based key was partition_id << 33 on
    the one-row-per-partition partials, making pmod 64 identically
    zero.)"""
    from kafka_sparkstreaming_sbt_spark.operators.bloom import (
        _bitmap_partials,
        bloom_params,
    )

    corpus, _ = keyed
    n_bits, n_hashes = bloom_params(5000, 0.01)
    partials = _bitmap_partials(
        corpus.repartition(8), "key", n_bits, n_hashes
    )
    fans = {r["fan"] for r in partials.select("fan").collect()}
    assert len(fans) > 1, f"fan-in collapsed to {fans}"


def test_null_keys_pass_through_as_new(keyed, spark):
    """NULL batch keys are kept as new (anti-join semantics) even
    when the corpus itself contains a NULL key — the documented
    NOT-EXISTS convention, deliberately unlike SQL NOT IN."""
    corpus, batch = keyed
    null_row = spark.range(1).select(
        F.lit(None).cast("string").alias("key")
    )
    out = bloom_screen(
        batch.unionByName(null_row),
        corpus.unionByName(null_row),
        "key",
        expected_items=5000,
    )
    keys = [r["key"] for r in out.collect()]
    assert None in keys
    assert len(keys) == 1001  # 5000..5999 plus the NULL row


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

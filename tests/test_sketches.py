"""Sketch aggregates: HLL++ approximate distinct vs the exact count
(the driver gate is rows-only for sketch values — this tolerance
check IS the correctness gate)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_approx_quantiles_within_rank_error(spark, sf_small):
    """Quantile sketch vs exact: approx_percentile(accuracy=1e4)
    bounds RANK error at ~1/accuracy, so compare by rank — the
    returned value's true quantile position must sit near the
    requested one (value-space deltas are meaningless for arbitrary
    distributions)."""
    from pyspark.sql import functions as F

    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    approx = {
        r.event_type: (r.p25, r.p50, r.p75, r.n_events)
        for r in entry_mod.q_approx_value_quantiles(spark, sf_small).collect()
    }
    events = read_table(spark, sf_small, "events")
    for etype, (p25, p50, p75, n) in approx.items():
        vals = [
            r.value
            for r in events.filter(F.col("event_type") == etype)
            .select("value")
            .collect()
        ]
        vals.sort()
        assert len(vals) == n
        for target, got in ((0.25, p25), (0.5, p50), (0.75, p75)):
            import bisect

            rank = bisect.bisect_right(vals, got) / len(vals)
            assert abs(rank - target) <= 0.02 + 1.0 / len(vals), (
                etype,
                target,
                rank,
            )
        assert p25 <= p50 <= p75


def test_approx_distinct_users_within_rsd(spark, sf_small):
    approx = {
        r.day: r.approx_users
        for r in entry_mod.q_approx_distinct_users(spark, sf_small).collect()
    }
    exact = {
        r.day: r.active_users
        for r in entry_mod.q_daily_active_users(spark, sf_small).collect()
    }
    assert approx.keys() == exact.keys()
    for day, e in exact.items():
        a = approx[day]
        # rsd=0.02 requested; allow 3 sigma plus integer slack
        assert abs(a - e) <= max(3, 0.06 * e), (day, a, e)


def test_cms_estimate_one_sided_and_exact_on_sparse(spark):
    """Count-min estimates NEVER undercount, and with far fewer keys
    than counters (no collisions forced) they equal the exact counts."""
    from pyspark.sql import functions as F

    from kafka_sparkstreaming_sbt_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    rows = [(k,) for k in ["a"] * 50 + ["b"] * 7 + ["c"] * 1]
    df = spark.createDataFrame(rows, ["k"])
    sketch = cms_sketch(df, "k", depth=4, width=256)
    est = {
        r.k: r.est_count
        for r in cms_estimate(
            sketch, df.select("k").distinct(), "k", depth=4, width=256
        ).collect()
    }
    exact = {r.k: r.cnt for r in df.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    for k, e in exact.items():
        assert est[k] >= e, (k, est[k], e)
    # 3 keys in 256 buckets x 4 rows: some row is collision-free, so
    # the min equals the true count
    assert est == exact


def test_cms_merge_equals_whole(spark):
    """Counters are linear: sketch(A) + sketch(B) == sketch(A u B),
    row for row — the mergeable-summary contract that lets per-batch
    sketches roll up without touching history."""
    from kafka_sparkstreaming_sbt_spark.operators.sketches import (
        cms_merge,
        cms_sketch,
    )

    rows = [(i, f"k{i % 17}") for i in range(300)]
    df = spark.createDataFrame(rows, ["i", "k"])
    a = df.filter("i < 120")
    b = df.filter("i >= 120")
    merged = {
        (r.row, r.bucket): r.cnt
        for r in cms_merge(
            cms_sketch(a, "k"), cms_sketch(b, "k")
        ).collect()
    }
    whole = {
        (r.row, r.bucket): r.cnt for r in cms_sketch(df, "k").collect()
    }
    assert merged == whole


def test_cms_unseen_key_small_estimate(spark):
    """A key the sketch never saw gets only collision mass — bounded
    by the count-min error guarantee (2N/width per row, and the min
    over rows is far smaller)."""
    from kafka_sparkstreaming_sbt_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    df = spark.createDataFrame([(f"k{i}",) for i in range(500)], ["k"])
    sketch = cms_sketch(df, "k", depth=4, width=256)
    unseen = spark.createDataFrame([("never-seen",)], ["k"])
    est = cms_estimate(sketch, unseen, "k", depth=4, width=256).collect()
    assert len(est) == 1
    # N=500, width=256 -> expected collision mass ~2/row; min over 4
    # rows is almost surely <= a few
    assert 0 <= est[0].est_count <= 10


def test_cms_weighted_sums(spark):
    """weight_col switches the sketch to weighted sums (bytes per
    key): estimates are min-of-counters over SUMS, still one-sided
    and exact when collision-free."""
    from kafka_sparkstreaming_sbt_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    rows = [("a", 10), ("a", 5), ("b", 100), ("c", 1)]
    df = spark.createDataFrame(rows, ["k", "bytes"])
    sketch = cms_sketch(df, "k", depth=4, width=256, weight_col="bytes")
    est = {
        r.k: r.est_count
        for r in cms_estimate(
            sketch, df.select("k").distinct(), "k", depth=4, width=256
        ).collect()
    }
    assert est == {"a": 15, "b": 100, "c": 1}


def test_cms_null_keys_survive_and_bucket_deterministically(spark):
    """NULL keys hash through an explicit sentinel (concat_ws would
    silently drop the NULL and hash the row salt alone) and are NOT
    dropped by cms_estimate's key aggregation."""
    from kafka_sparkstreaming_sbt_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    rows = [("a",)] * 5 + [(None,)] * 3
    df = spark.createDataFrame(rows, "k string")
    sketch = cms_sketch(df, "k", depth=4, width=256)
    est = {
        r.k: r.est_count
        for r in cms_estimate(sketch, df.select("k").distinct(), "k").collect()
    }
    assert est["a"] >= 5
    assert None in est and est[None] >= 3
    # sentinel != the empty string's buckets: '' and NULL may not share
    # all depth buckets by construction of distinct hash inputs
    df2 = spark.createDataFrame([("",)] * 3, "k string")
    s2 = cms_sketch(df2, "k", depth=4, width=256)
    b_null = {(r.row, r.bucket) for r in cms_sketch(
        spark.createDataFrame([(None,)], "k string"), "k").collect()}
    b_empty = {(r.row, r.bucket) for r in s2.collect()}
    assert b_null != b_empty

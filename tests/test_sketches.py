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

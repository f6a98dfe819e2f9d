"""Sketch aggregates: HLL++ approximate distinct vs the exact count
(the driver gate is rows-only for sketch values — this tolerance
check IS the correctness gate)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


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

"""Property-based tests (hypothesis) for the semantics the golden
fixtures pin pointwise: sliding-window duplication/conservation,
rollup consistency, and dedup idempotence hold for ARBITRARY inputs,
not just the pinned examples."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.dedup import dedup_transactions
from kafka_sparkstreaming_sbt_spark.operators.rollup import (
    daily_rollup_deterministic,
    daily_spending_direct,
)
from kafka_sparkstreaming_sbt_spark.operators.windows import windowed_spending

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# amounts in cents -> exact doubles; timestamps within one day, whole
# seconds (away from midnight so both sliding windows share the date)
txn_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=99),     # customer
        st.integers(min_value=3600, max_value=82800),  # second of day
        st.integers(min_value=1, max_value=100_000),   # cents
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, rows):
    base = dt.datetime(2025, 3, 10)
    data = [
        (
            f"t{i}",
            str(cust),
            base + dt.timedelta(seconds=sec),
            cents / 100.0,
        )
        for i, (cust, sec, cents) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "transaction_id string, customer_id string, "
        "timestamp timestamp, amount double",
    )


@_slow
@given(rows=txn_strategy)
def test_sliding_window_duplicates_each_event_twice(spark, rows):
    """A1 semantics: every event lands in exactly ceil(10/5)=2 windows
    with its FULL amount, so the windowed total is exactly 2x the
    input total (the invariant behind the golden 6-row fixture)."""
    df = _df(spark, rows)
    out = windowed_spending(df, per_transaction=True).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("window_total_spent"), 2).alias("total"),
    ).first()
    assert out.n == 2 * len(rows)
    assert out.total == round(
        2 * sum(c for _, _, c in rows) / 100.0, 2
    )


@_slow
@given(rows=txn_strategy)
def test_rollup_equals_direct_daily(spark, rows):
    """The windowed-then-deduped rollup and the commented-out 'direct'
    semantics (A4) agree on every (customer, date) total — the
    equivalence the reference's golden test asserts for one input."""
    df = _df(spark, rows)
    via_window = daily_rollup_deterministic(
        windowed_spending(df, per_transaction=True)
    )
    direct = daily_spending_direct(df)
    a = {
        (r.customer_id, str(r.transaction_date)): round(r.total_spent, 2)
        for r in via_window.collect()
    }
    b = {
        (r.customer_id, str(r.transaction_date)): round(r.total_spent, 2)
        for r in direct.collect()
    }
    assert a == b


@_slow
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # txn id (collisions!)
            st.integers(min_value=0, max_value=99),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_dedup_idempotent_and_exact(spark, rows):
    """D1: one surviving row per transaction_id; reapplying is a
    no-op."""
    base = dt.datetime(2025, 3, 10, 12)
    df = spark.createDataFrame(
        [
            (f"t{tid}", str(cust), base, 1.0)
            for tid, cust in rows
        ],
        "transaction_id string, customer_id string, "
        "timestamp timestamp, amount double",
    )
    once = dedup_transactions(df)
    assert once.count() == len({tid for tid, _ in rows})
    assert dedup_transactions(once).count() == once.count()

"""Golden-fixture parity (FIXTURES.md §2) — pins the reference's
non-obvious sliding-window + dedup semantics:

- §2.1 windowed per-txn A1: 3 txns -> exactly 6 rows, full amount in
  each of the 2 covering windows (CustomerSpendingIntegrationTest
  .scala:180-187, compared set-wise and by symmetric except).
- §2.2 per-customer A2: 2 txns -> 4 rows summing 500.0 (Failed status
  included) (CustomerSpendingAnalysisTestMock.scala:58-60), plus the
  merged-amount golden (IT:253-258).
- §2.3 daily rollup A1+A3 over 10 rows incl. an exact-duplicate txn ->
  4 daily rows (IT:444-449).
"""

from __future__ import annotations

import datetime as dt

import pytest

from kafka_sparkstreaming_sbt_spark.operators.rollup import (
    daily_rollup,
    daily_rollup_deterministic,
)
from kafka_sparkstreaming_sbt_spark.operators.windows import windowed_spending
from kafka_sparkstreaming_sbt_spark.schemas import TRANSACTION_SCHEMA
from kafka_sparkstreaming_sbt_spark.streaming.pipeline import (
    aggregate_transactions,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def make_txns(spark, rows):
    """rows: (txn, cust, iso_ts, amount, status)"""
    data = [
        (t, c, 10, ts(when), amt, "Credit Card", st)
        for (t, c, when, amt, st) in rows
    ]
    return spark.createDataFrame(data, TRANSACTION_SCHEMA)


GOLDEN_21_INPUT = [
    ("t1", "1", "2025-03-10T12:01:00", 100.0, "Success"),
    ("t2", "1", "2025-03-10T12:05:00", 150.0, "Pending"),
    ("t3", "1", "2025-03-10T12:11:00", 200.0, "Success"),
]

GOLDEN_21_EXPECTED = {
    ("1", "t1", "11:55", "12:05", 100.0),
    ("1", "t1", "12:00", "12:10", 100.0),
    ("1", "t2", "12:00", "12:10", 150.0),
    ("1", "t2", "12:05", "12:15", 150.0),
    ("1", "t3", "12:05", "12:15", 200.0),
    ("1", "t3", "12:10", "12:20", 200.0),
}


def test_golden_windowed_per_txn(spark):
    """FIXTURES.md §2.1 — exactly 6 rows, full amounts, both windows."""
    df = make_txns(spark, GOLDEN_21_INPUT)
    out = aggregate_transactions(df).collect()
    assert len(out) == 6
    got = {
        (
            r.customer_id,
            r.transaction_id,
            r.window_start.strftime("%H:%M"),
            r.window_end.strftime("%H:%M"),
            r.window_total_spent,
        )
        for r in out
    }
    assert got == GOLDEN_21_EXPECTED


def test_golden_per_customer_mock(spark):
    """FIXTURES.md §2.2 — 2 txns (one Failed, still counted) -> 4 rows
    totalling 500.0."""
    df = make_txns(
        spark,
        [
            ("t1", "1", "2025-03-10T12:01:00", 100.0, "Success"),
            ("t2", "2", "2025-03-10T12:05:00", 150.0, "Failed"),
        ],
    )
    out = windowed_spending(df, per_transaction=False).collect()
    assert len(out) == 4
    assert sum(r.total_spent for r in out) == 500.0


def test_golden_per_customer_merged(spark):
    """FIXTURES.md §2.2 merged-amount golden (IT:253-258): the §2.1
    input without txn-id grouping merges amounts per window."""
    df = make_txns(spark, GOLDEN_21_INPUT)
    out = windowed_spending(df, per_transaction=False).collect()
    got = {
        (r.window_start.strftime("%H:%M"), r.total_spent) for r in out
    }
    assert got == {
        ("11:55", 100.0),
        ("12:00", 250.0),
        ("12:05", 350.0),
        ("12:10", 200.0),
    }


GOLDEN_23_INPUT = [
    ("t1", "1", "2025-03-10T12:01:00", 100.0, "Success"),
    ("t2", "1", "2025-03-10T12:05:00", 150.0, "Pending"),
    ("t3", "1", "2025-03-10T12:11:00", 200.0, "Success"),
    ("t3", "1", "2025-03-10T12:11:00", 200.0, "Success"),  # exact dup
    ("t9", "1", "2025-03-11T12:11:00", 2000.0, "Success"),
    ("t4", "2", "2025-03-11T09:00:00", 300.0, "Success"),
    ("t5", "2", "2025-03-11T09:05:00", 50.0, "Failed"),  # still counted
    ("t6", "3", "2025-03-12T10:00:00", 500.0, "Success"),
    ("t7", "3", "2025-03-12T10:03:00", 100.0, "Success"),
    ("t8", "3", "2025-03-12T10:06:00", 200.0, "Success"),
]

GOLDEN_23_EXPECTED = {
    ("1", dt.date(2025, 3, 10), 450.0),
    ("1", dt.date(2025, 3, 11), 2000.0),
    ("2", dt.date(2025, 3, 11), 350.0),
    ("3", dt.date(2025, 3, 12), 800.0),
}


@pytest.mark.parametrize(
    "rollup_fn", [daily_rollup, daily_rollup_deterministic]
)
def test_golden_daily_rollup(spark, rollup_fn):
    """FIXTURES.md §2.3 — duplicate txn dropped, each distinct txn
    counted exactly once per day despite the 2-window expansion; holds
    for both the parity-exact and deterministic rollups (no event here
    is within 5 min of midnight)."""
    df = make_txns(spark, GOLDEN_23_INPUT)
    windowed = aggregate_transactions(df)
    out = rollup_fn(windowed).collect()
    got = {
        (r.customer_id, r.transaction_date, r.total_spent) for r in out
    }
    assert got == GOLDEN_23_EXPECTED


def test_status_never_filtered(spark):
    """SURVEY.md §2.3: no filter exists anywhere in the pipeline —
    Failed/Pending amounts count (pinned by t5 in the golden data)."""
    df = make_txns(
        spark, [("tF", "9", "2025-03-10T12:01:00", 42.0, "Failed")]
    )
    out = daily_rollup(aggregate_transactions(df)).collect()
    assert [(r.customer_id, r.total_spent) for r in out] == [("9", 42.0)]

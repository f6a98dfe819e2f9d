"""Daily spending rollup (SURVEY.md §2.5 A3 + compound A1+A3 semantics).

Reference pipeline inside foreachBatch (CustomerSpendingAnalysis
.scala:104-109 = :123-128 = :153-158):

    dropDuplicates(transaction_id)
    -> withColumn(transaction_date, window_start.cast(date))
    -> groupBy(customer_id, transaction_date).agg(sum(window_total_spent) AS total_spent)
    -> dropDuplicates(customer_id, transaction_date)

Fed by the A1 per-transaction windowed agg, each transaction arrives
as 2 window rows with the same full amount; the dedup keeps ONE
arbitrary row per transaction, so the daily total counts each distinct
transaction exactly once (golden: FIXTURES.md §2.3).  Which of the two
window rows survives is nondeterministic — observable only for events
in the first 5 minutes after midnight, whose earlier window starts on
the previous date (SURVEY.md §2.5 edge).

``daily_rollup`` reproduces that pipeline verbatim (parity mode).
``daily_rollup_deterministic`` keeps the declared semantics ("each
transaction counted once, dated by its window") but resolves the
arbitrary-survivor choice deterministically by keeping the LATER
window (max window_start == the slide-aligned floor of the event
time, so the date always equals the event's own date).  This is the
variant exposed to the DuckDB oracle, and it replaces the blind
``dropDuplicates`` with a max-aggregation — same shuffle shape, no
nondeterminism, skew-safe at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.operators.dedup import (
    dedup_daily,
    dedup_transactions,
)


def daily_rollup(windowed: DataFrame) -> DataFrame:
    """Parity-exact A3 over A1 output (CSA:153-158).

    Input columns: customer_id, transaction_id, window_start,
    window_end, window_total_spent (the A1 shape).
    """
    return dedup_daily(
        dedup_transactions(windowed)
        .withColumn("transaction_date", F.col("window_start").cast("date"))
        .groupBy("customer_id", "transaction_date")
        .agg(F.sum("window_total_spent").alias("total_spent"))
    )


def daily_rollup_deterministic(windowed: DataFrame) -> DataFrame:
    """A3 with a deterministic per-transaction survivor (max
    window_start) instead of ``dropDuplicates``'s arbitrary row.

    groupBy(transaction_id) -> max(window_start), first(amount) is the
    same single shuffle ``dropDuplicates`` costs, but reproducible —
    required for oracle comparison and preferable at scale (no
    dependence on partition-arrival order).
    """
    per_txn = windowed.groupBy("customer_id", "transaction_id").agg(
        F.max("window_start").alias("window_start"),
        F.first("window_total_spent").alias("window_total_spent"),
    )
    return (
        per_txn.withColumn(
            "transaction_date", F.col("window_start").cast("date")
        )
        .groupBy("customer_id", "transaction_date")
        .agg(F.sum("window_total_spent").alias("total_spent"))
    )


def daily_spending_direct(
    transactions: DataFrame,
    ts_col: str = "timestamp",
    customer_col: str = "customer_id",
    amount_col: str = "amount",
) -> DataFrame:
    """A4 — the reference's commented-out 'intended' semantics
    (CSA:45-61, :91-96): dedup then aggregate straight to
    (customer, date) without the window detour.  One shuffle fewer
    than A1+A3; equals the rollup whenever no event sits within the
    first slide after midnight."""
    return (
        dedup_transactions(transactions)
        .groupBy(
            F.col(customer_col),
            F.col(ts_col).cast("date").alias("transaction_date"),
        )
        .agg(F.sum(amount_col).alias("total_spent"))
    )

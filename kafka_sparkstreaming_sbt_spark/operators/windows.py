"""Sliding-window spending aggregation (SURVEY.md §2.5 A1-A2, §2.6 W3).

Two variants, both 10-minute windows sliding every 5 minutes (every
event lands in exactly 2 windows — Spark's ``TimeWindowing`` rule
expands the event, then the hash agg merges):

- A1 per-transaction (CustomerSpendingAnalysis.scala:76-88): groupBy
  includes ``transaction_id`` (flagged 'can be removed used for
  testing' CSA:79) so each transaction yields 2 rows carrying its FULL
  amount — amounts never merge across transactions.  Output column is
  ``window_total_spent``.
- A2 per-customer (CustomerSpendingAnalysisNew1.scala:41-51,
  CustomerSpendingAnalysisTrail.scala:55-62): no transaction key;
  amounts merge per (window, customer).  Output column ``total_spent``.

Physical plan: partial hash-agg (map-side combine) -> shuffle on the
grouping keys -> final hash-agg; the window expansion happens *before*
the partial agg so the shuffle carries at most 2x rows already
pre-combined — this is exactly the plan you want at 100 TB and it is
what Catalyst produces from this declarative form (verified in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW_DURATION = "10 minutes"
SLIDE_DURATION = "5 minutes"


def windowed_spending(
    df: DataFrame,
    per_transaction: bool = False,
    ts_col: str = "timestamp",
    customer_col: str = "customer_id",
    amount_col: str = "amount",
    txn_col: str = "transaction_id",
    window_duration: str = WINDOW_DURATION,
    slide_duration: str = SLIDE_DURATION,
    watermark: str | None = None,
) -> DataFrame:
    """Windowed sum of spending per customer (A2) or per customer x
    transaction (A1).

    ``watermark`` (e.g. ``"5 seconds"`` per CSA:75, ``"5 minutes"``
    per Trail:54) is applied only when set — batch DataFrames ignore
    watermarks anyway, and the CSAN1 variant runs without one
    (CSAN1:40 commented out).
    """
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)

    keys = [
        F.window(F.col(ts_col), window_duration, slide_duration),
        F.col(customer_col),
    ]
    alias = "total_spent"
    if per_transaction:
        keys.append(F.col(txn_col))
        alias = "window_total_spent"

    agg = df.groupBy(*keys).agg(F.sum(amount_col).alias(alias))

    out_cols = [
        F.col(customer_col),
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
    ]
    if per_transaction:
        out_cols.insert(1, F.col(txn_col))
    out_cols.append(F.col(alias))
    return agg.select(*out_cols)

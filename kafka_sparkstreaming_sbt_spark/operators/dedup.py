"""Exact deduplication (SURVEY.md §2.4 D1-D3).

The reference's signature semantics:

- D1: ``dropDuplicates("transaction_id")`` on the parsed stream
  (CustomerSpendingAnalysis.scala:71) — keeps an arbitrary first row
  per id; under streaming this is a stateful ``StreamingDeduplicate``
  whose state is UNBOUNDED because the call sits upstream of the
  watermark (§2.6 W7).
- D2: the same call re-applied per micro-batch inside foreachBatch
  (CSA:105,153).
- D3: ``dropDuplicates("customer_id","transaction_date")`` after the
  daily agg (CSA:109,158) — a declared no-op (groupBy on the same keys
  already yields unique rows) preserved for parity.

Scale notes: ``dropDuplicates`` is a hash shuffle on the key — the
right primitive at 100 TB *if* the key is high-cardinality and
unskewed (transaction ids are).  For streams we additionally expose
``dedup_transactions_within_watermark`` (built-in since Spark 3.5,
same minor version as the reference's build.sbt:10) which bounds the
state the reference leaves unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_transactions(
    df: DataFrame, key: str = "transaction_id"
) -> DataFrame:
    """D1/D2: keep one arbitrary row per ``key`` (CSA:71, CSA:105)."""
    return df.dropDuplicates([key])


def dedup_transactions_within_watermark(
    df: DataFrame,
    key: str = "transaction_id",
    watermark_col: str = "timestamp",
    delay: str = "5 seconds",
) -> DataFrame:
    """Bounded-state streaming dedup — the idiomatic fix for the
    reference's unbounded dedup state (SURVEY.md §2.6 W7).  Only valid
    on streaming DataFrames; duplicates arriving within the watermark
    delay are dropped, state for older keys is evicted."""
    return df.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        [key]
    )


def dedup_daily(df: DataFrame) -> DataFrame:
    """D3: post-agg dedup on (customer_id, transaction_date) — the
    reference's 'avoid overwriting if already written' guard
    (CSA:158), a no-op after the groupBy on the same keys but part of
    the declared pipeline."""
    return df.dropDuplicates(["customer_id", "transaction_date"])

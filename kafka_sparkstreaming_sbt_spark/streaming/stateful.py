"""Custom stateful streaming operator via ``applyInPandasWithState``
(extension surface — the reference's only state is implicit in its
windowed agg + dropDuplicates, SURVEY.md §2.12; this is the escape
hatch for state machines those built-ins can't express).

The example operator keeps a per-customer running spend total and
transaction count across micro-batches — the "customer lifetime value
so far" companion to the reference's per-day rollup.  State is one
(double, long) pair per customer, Arrow-batched per group, stored in
Spark's HDFS-backed state store exactly like the built-in stateful
operators — so it checkpoints, recovers, and scales per-key the same
way.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    pass

RUNNING_TOTAL_OUTPUT = StructType(
    [
        StructField("customer_id", StringType()),
        StructField("running_total", DoubleType()),
        StructField("n_transactions", LongType()),
    ]
)

RUNNING_TOTAL_STATE = StructType(
    [
        StructField("total", DoubleType()),
        StructField("n", LongType()),
    ]
)


def _update_running_total(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["amount"].sum())
        n += len(pdf)
    state.update((total, n))
    yield pd.DataFrame(
        {
            "customer_id": [key[0]],
            "running_total": [round(total, 2)],
            "n_transactions": [n],
        }
    )


def running_totals(transactions: DataFrame) -> DataFrame:
    """Per-customer running (total, count) across all micro-batches.

    Works on a streaming DataFrame with ``customer_id``/``amount``
    columns; emits one updated row per customer per batch (update
    output mode).
    """
    return transactions.groupBy("customer_id").applyInPandasWithState(
        _update_running_total,
        outputStructType=RUNNING_TOTAL_OUTPUT,
        stateStructType=RUNNING_TOTAL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

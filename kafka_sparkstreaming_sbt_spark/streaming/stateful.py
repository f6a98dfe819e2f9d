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


def ensure_tws_support() -> None:
    """Raise with the missing dependency if Spark 4's
    transformWithState Python runner can't start here (it imports
    ``google.protobuf`` in the state-server handshake).

    Vendoring investigated and rejected (r8): pyspark's generated
    ``StateMessage_pb2`` drives the FULL descriptor-pool runtime
    (``descriptor_pool`` + ``internal.builder`` over a serialized
    FileDescriptorProto, with a runtime-version handshake pinned to
    protobuf 6.x) — a local shim would have to reimplement protobuf
    wire-format encode/decode generically from descriptors, and any
    subtle divergence corrupts the JVM<->Python state-server protocol
    SILENTLY (wrong state, not an error).  Installs are off-limits in
    this environment, so the honest posture is the machine-visible
    gate: bench records ``tws_state_api: gated``, and
    :func:`running_totals` (applyInPandasWithState — no protobuf
    dependency) is the executable equivalent, covering the same
    per-key cross-batch state semantics in the test suite."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "for Spark's Python state server — pip install protobuf "
            "(applyInPandasWithState's running_totals has no such "
            "dependency and is the drop-in alternative)"
        ) from e


def running_totals_tws(transactions: DataFrame) -> DataFrame:
    """Per-customer running spend via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-stateful-processing API (StatefulProcessor +
    typed state handles), the successor to ``applyInPandasWithState``
    used by :func:`running_totals`.

    Semantics are identical to :func:`running_totals` (one
    (total, n) ValueState per customer, updated per micro-batch and
    emitted in update mode); what changes is the state surface: the
    processor declares a NAMED, schema'd ValueState through the
    handle, which is what unlocks Spark 4 state features (TTL, state
    v2 readers, per-state schemas) without custom tuple packing.

    ENVIRONMENT-GATED like the Kafka/Avro connectors: Spark's
    transformWithState Python runner speaks protobuf to the JVM, so
    the ``protobuf`` package must be installed; without it the
    streaming runner crashes at init, so fail fast with the
    actionable dependency instead.
    """
    ensure_tws_support()
    from pyspark.sql.streaming import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", RUNNING_TOTAL_STATE
            )

        def handleInputRows(self, key, rows, timerValues):
            total, n = (
                self._totals.get() if self._totals.exists() else (0.0, 0)
            )
            for pdf in rows:
                total += float(pdf["amount"].sum())
                n += len(pdf)
            self._totals.update((total, n))
            yield pd.DataFrame(
                {
                    "customer_id": [key[0]],
                    "running_total": [round(total, 2)],
                    "n_transactions": [n],
                }
            )

        def close(self) -> None:
            pass

    return transactions.groupBy("customer_id").transformWithStateInPandas(
        statefulProcessor=Processor(),
        outputStructType=RUNNING_TOTAL_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )

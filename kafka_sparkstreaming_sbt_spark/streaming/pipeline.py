"""End-to-end customer-spending pipeline (SURVEY.md §3.1 lifecycle).

Mirrors ``CustomerSpendingAnalysis.main`` (CSA:186-220): source ->
decode -> dedup -> watermark -> sliding-window agg -> foreachBatch
daily rollup -> JDBC append -> block.  Source and sink are injected so
tests run the identical transform chain over file/rate sources and an
in-memory collector instead of live Kafka/Postgres.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kafka_sparkstreaming_sbt_spark.functions.scalar import to_utc
from kafka_sparkstreaming_sbt_spark.operators.dedup import dedup_transactions
from kafka_sparkstreaming_sbt_spark.operators.rollup import daily_rollup
from kafka_sparkstreaming_sbt_spark.operators.windows import windowed_spending
from kafka_sparkstreaming_sbt_spark.streaming.sinks import (
    start_foreach_batch_sink,
)


def aggregate_transactions(
    df: DataFrame, watermark: str | None = "5 seconds"
) -> DataFrame:
    """The canonical transform chain (CSA:63-98): UTC-normalize ->
    dedup by transaction_id -> watermark 5 s -> A1 per-transaction
    sliding-window sum.

    Works on both batch and streaming inputs — the reference's own
    unit tests run it batch-mode (UT:51-73).  Note D1 sits BEFORE the
    watermark exactly as in the reference (CSA:71 before CSA:75),
    reproducing its unbounded-dedup-state placement (§2.6 W7);
    ``operators.dedup.dedup_transactions_within_watermark`` is the
    bounded alternative.
    """
    df = df.withColumn("timestamp", to_utc(F.col("timestamp")))
    df = dedup_transactions(df)
    return windowed_spending(df, per_transaction=True, watermark=watermark)


def run_spending_pipeline(
    transactions: DataFrame,
    write_daily: Callable[[DataFrame], None],
    checkpoint_location: str | None = None,
    watermark: str | None = "5 seconds",
    swallow_errors: bool = True,
    observe_metrics: bool = False,
) -> StreamingQuery:
    """Start the streaming query (CSA:141-180 ``writeToPostgres``).

    ``write_daily`` receives the per-batch daily rollup (the
    (customer_id, transaction_date, total_spent) frame) — pass a JDBC
    appender (sources.jdbc.write_jdbc_append) for the reference
    topology or any collector in tests.

    ``observe_metrics=True`` attaches Spark's Observation metrics to
    the decoded input: every micro-batch's StreamingQueryProgress
    then carries ``observedMetrics["ingest"]`` with the batch's row
    count, total amount, and null-timestamp (decode-failure) count —
    the engine-native replacement for the reference's per-batch
    ``count()`` log line (CSA:170), which re-executed the batch plan
    just to log its size; ``observe`` rides the existing pass for
    free.
    """
    if observe_metrics:
        transactions = transactions.observe(
            "ingest",
            F.count(F.lit(1)).alias("rows"),
            F.round(F.sum("amount"), 2).alias("total_amount"),
            F.count_if(F.col("timestamp").isNull()).alias("null_ts_rows"),
        )
    windowed = aggregate_transactions(transactions, watermark=watermark)

    def _per_batch(batch_df: DataFrame, batch_id: int) -> None:
        daily = daily_rollup(batch_df)
        write_daily(daily)

    return start_foreach_batch_sink(
        windowed,
        _per_batch,
        output_mode="update",
        checkpoint_location=checkpoint_location,
        query_name="customer_spending",
        swallow_errors=swallow_errors,
    )

"""Synthetic transaction generator (SURVEY.md §2.1 S5).

The reference's producer (KafkaProducerApp.scala:29-48) emits one JSON
transaction every 2 s: UUID transaction_id, customer 1-1000, merchant
1-500, amount U(0,1000) rounded to 2 dp, now-timestamp, payment_method
in 5 values, status in 3 values, keyless.

Spark-first re-expression: a ``rate`` source (streaming) or ``range``
(batch) plus pure column expressions — fully JVM-side, seeded,
distribution-identical, no external Kafka needed for demos/tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAYMENT_METHODS = (
    "Credit Card",
    "Debit Card",
    "PayPal",
    "UPI",
    "Net Banking",
)
STATUSES = ("Success", "Pending", "Failed")


def _with_transaction_columns(df: DataFrame, id_col: str, ts_col: str) -> DataFrame:
    """Derive the 7 transaction columns from a monotonic id + timestamp.

    ``F.rand(seed)`` keeps runs deterministic; every expression is a
    built-in Catalyst function (whole-stage codegen, no Python).
    """
    pm = F.array(*[F.lit(p) for p in PAYMENT_METHODS])
    st = F.array(*[F.lit(s) for s in STATUSES])
    return df.select(
        F.sha2(F.col(id_col).cast("string"), 256).alias("transaction_id"),
        (F.floor(F.rand(1) * 1000) + 1).cast("string").alias("customer_id"),
        (F.floor(F.rand(2) * 500) + 1).cast("int").alias("merchant_id"),
        F.col(ts_col).alias("timestamp"),
        F.round(F.rand(3) * 1000, 2).alias("amount"),
        F.element_at(pm, (F.floor(F.rand(4) * 5) + 1).cast("int")).alias(
            "payment_method"
        ),
        F.element_at(st, (F.floor(F.rand(5) * 3) + 1).cast("int")).alias(
            "status"
        ),
    )


def synthetic_transactions_stream(
    spark: SparkSession, rows_per_second: int = 1
) -> DataFrame:
    """Streaming generator: rate source -> transaction columns.

    ``rows_per_second=1`` approximates the reference's 0.5 ev/s cadence
    (KafkaProducerApp.scala:58) while staying testable; raise it for
    load tests.
    """
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    return _with_transaction_columns(rate, "value", "timestamp")


def synthetic_transactions_batch(
    spark: SparkSession,
    n: int,
    start_ts: str = "2025-03-10 12:00:00",
    step_seconds: int = 2,
) -> DataFrame:
    """Batch generator: ``spark.range`` -> transaction columns, with
    timestamps advancing ``step_seconds`` per row (matching the
    producer's one-message-per-2 s loop)."""
    base = spark.range(n).withColumn(
        "ts",
        F.to_timestamp(F.lit(start_ts))
        + F.make_interval(secs=F.col("id") * step_seconds),
    )
    return _with_transaction_columns(base, "id", "ts")


def transactions_as_json(df: DataFrame) -> DataFrame:
    """Serialize transactions to the producer's wire shape — a keyless
    JSON string ``value`` column (KafkaProducerApp.scala:39-47) — ready
    for a Kafka sink or for round-trip tests through
    ``parse_transactions``."""
    return df.select(
        F.to_json(
            F.struct(*[F.col(c) for c in df.columns]),
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss'Z'"},
        ).alias("value")
    )

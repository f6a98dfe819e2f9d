"""Fixed transaction schemas (SURVEY.md §1.2).

The reference declares two explicit StructTypes and applies them at
JSON-parse time via ``from_json`` (schema-on-read, PERMISSIVE):

- 7-field canonical  (CustomerSpendingAnalysis.scala:21-28)
- 8-field prototype  (CustomerSpendingAnalysisTrail.scala:15-23)

``from_json`` is lenient: the producer emits ``customer_id`` as a JSON
*number* (KafkaProducerApp.scala:41) against a String field and Spark
coerces; malformed rows become all-null structs.  Both behaviors are
pinned by tests/test_schemas.py.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Canonical 7-field transaction (CustomerSpendingAnalysis.scala:21-28).
TRANSACTION_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("merchant_id", T.IntegerType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("payment_method", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)

#: 8-field prototype variant (CustomerSpendingAnalysisTrail.scala:15-23):
#: drops merchant_id, adds currency + category.
TRANSACTION_SCHEMA_V8 = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("payment_method", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)

#: Sink-table schema (CustomerSpendingIntegrationTest.scala:55-63):
#: customer_daily_spending(customer_id, transaction_date, total_spent)
#: with PK (customer_id, transaction_date).
DAILY_SPENDING_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("transaction_date", T.DateType(), False),
        T.StructField("total_spent", T.DoubleType(), True),
    ]
)

#: Driver testdata ``events`` table -> transaction column mapping
#: (FIXTURES.md §1.4): event_id→transaction_id, user_id→customer_id,
#: ts→timestamp, value→amount, event_type→payment_method/status analog,
#: props (JSON string)→extras.
EVENTS_TO_TRANSACTIONS = {
    "event_id": "transaction_id",
    "user_id": "customer_id",
    "ts": "timestamp",
    "value": "amount",
    "event_type": "payment_method",
}

#: Schema of the ``props`` JSON payload carried by the events table.
EVENT_PROPS_SCHEMA = T.StructType(
    [T.StructField("k", T.IntegerType(), True)]
)

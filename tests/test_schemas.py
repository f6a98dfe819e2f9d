"""Schema + JSON-decode semantics (SURVEY.md §1.2, §2.1 S2):
lenient from_json (number->string coercion, malformed->null), the
CSA:42 timestamp re-parse quirk, and the producer wire round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.functions.scalar import (
    reparse_timestamp_whole_seconds,
)
from kafka_sparkstreaming_sbt_spark.schemas import (
    TRANSACTION_SCHEMA,
    TRANSACTION_SCHEMA_V8,
)
from kafka_sparkstreaming_sbt_spark.sources.kafka import parse_transactions
from kafka_sparkstreaming_sbt_spark.sources.synthetic import (
    synthetic_transactions_batch,
    transactions_as_json,
)

SAMPLE = (
    '{"transaction_id":"txn-1","customer_id":123,"merchant_id":10,'
    '"timestamp":"2025-03-10T12:01:00Z","amount":100.5,'
    '"payment_method":"UPI","status":"Success"}'
)


def _value_df(spark, *values: str):
    return spark.createDataFrame([(v,) for v in values], ["value"])


def test_schema_shapes():
    assert [f.name for f in TRANSACTION_SCHEMA.fields] == [
        "transaction_id",
        "customer_id",
        "merchant_id",
        "timestamp",
        "amount",
        "payment_method",
        "status",
    ]
    v8 = {f.name for f in TRANSACTION_SCHEMA_V8.fields}
    assert "currency" in v8 and "category" in v8 and "merchant_id" not in v8


def test_parse_lenient_number_to_string(spark):
    """KafkaProducerApp.scala:41 emits customer_id as a JSON number;
    from_json coerces it to the declared String."""
    row = parse_transactions(_value_df(spark, SAMPLE)).collect()[0]
    assert row.customer_id == "123"
    assert row.amount == 100.5
    assert row.timestamp.isoformat() == "2025-03-10T12:01:00"


def test_parse_malformed_to_null(spark):
    """PERMISSIVE mode: malformed JSON -> all-null row, never an error."""
    row = parse_transactions(_value_df(spark, "not json {{{")).collect()[0]
    assert row.transaction_id is None and row.amount is None


def test_parse_with_dlq_routes_corrupt_payloads(spark):
    """Dead-letter variant: malformed JSON and key-less objects carry
    their raw payload in _corrupt; valid rows carry NULL — so one
    filter splits good from dead without re-decoding."""
    from kafka_sparkstreaming_sbt_spark.sources.kafka import (
        parse_transactions_with_dlq,
    )

    rows = [
        (SAMPLE,),
        ("not json {{{",),
        ('{"customer_id": 5, "amount": 1.0}',),  # parses, no txn id
    ]
    df = spark.createDataFrame(rows, ["value"])
    out = parse_transactions_with_dlq(df).collect()
    good = [r for r in out if r._corrupt is None]
    dead = [r for r in out if r._corrupt is not None]
    assert len(good) == 1 and good[0].customer_id == "123"
    assert {r._corrupt for r in dead} == {
        "not json {{{",
        '{"customer_id": 5, "amount": 1.0}',
    }


def test_reparse_quirk_nulls_subseconds(spark):
    """CSA:42 quirk: whole-second timestamps survive the
    cast->string->parse round trip; sub-second timestamps come back
    NULL (the pattern has no fractional field)."""
    df = spark.createDataFrame(
        [("2025-03-10 12:01:00",), ("2025-03-10 12:01:00.123",)], ["s"]
    ).select(F.col("s").cast("timestamp").alias("ts"))
    out = df.select(
        reparse_timestamp_whole_seconds(F.col("ts")).alias("re")
    ).collect()
    assert out[0].re.isoformat() == "2025-03-10T12:01:00"
    assert out[1].re is None


def test_producer_wire_roundtrip(spark):
    """S5 generator -> JSON wire shape -> parse_transactions recovers
    the 7 fields with correct types (whole-second timestamps, so the
    parity re-parse is lossless here)."""
    txns = synthetic_transactions_batch(spark, 50)
    wire = transactions_as_json(txns)
    parsed = parse_transactions(wire)
    assert parsed.schema == TRANSACTION_SCHEMA
    rows = parsed.collect()
    assert len(rows) == 50
    assert all(r.transaction_id and r.timestamp is not None for r in rows)
    assert all(1 <= int(r.customer_id) <= 1000 for r in rows)
    assert all(0 <= r.amount <= 1000 for r in rows)

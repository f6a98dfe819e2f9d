"""Kafka streaming source + JSON deserialize/flatten (SURVEY.md §2.1
S1-S2).

The reference ingests with ``readStream.format("kafka")`` then does
``CAST(value AS STRING)`` -> ``from_json`` -> ``select("data.*")``
(CustomerSpendingAnalysis.scala:30-43).  ``parse_transactions`` is a
pure DataFrame->DataFrame function so the identical decode runs on a
streaming Kafka envelope, a file-source replay, or a batch fixture —
the property the reference's own tests exploit
(CustomerSpendingIntegrationTest.scala:418-421).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_sparkstreaming_sbt_spark.functions.scalar import (
    reparse_timestamp_whole_seconds,
)
from kafka_sparkstreaming_sbt_spark.schemas import TRANSACTION_SCHEMA


def ensure_kafka_support(spark: SparkSession) -> None:
    """Fail fast with an actionable message when the Kafka connector
    jar is absent (it is NOT bundled with plain pyspark): without this
    the first ``load()`` dies with an opaque 'Failed to find data
    source: kafka'.  Same gating discipline as ``sources.avro``.

    The probe goes through Spark's OWN provider lookup
    (``DataSource.lookupDataSource``) rather than a bare
    ``Class.forName``: the latter resolves on py4j's classloader,
    which can MISS jars that Spark's context classloader sees (e.g.
    ``spark.jars``/``addJar``-provisioned connectors) — a working
    setup must never be turned into a hard ImportError."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "kafka", spark._jsparkSession.sessionState().conf()
        )
    except Exception as exc:  # noqa: BLE001
        raise ImportError(
            "the spark-sql-kafka connector is not on the classpath; "
            "launch with --packages org.apache.spark:"
            "spark-sql-kafka-0-10_2.13:<spark-version> (or add the "
            "jar) to use the live Kafka source"
        ) from exc


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "transactions_topic",
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
    max_offsets_per_trigger: int | None = 100_000,
) -> DataFrame:
    """Kafka envelope stream (CustomerSpendingAnalysis.scala:32-38).

    ``startingOffsets=earliest`` + ``failOnDataLoss=false`` match the
    canonical variant; the refactored variant uses ``latest``
    (CustomerSpendingAnalysisNew1.scala:23-29).

    The reference sets the DStream-era conf
    ``spark.streaming.backpressure.enabled`` which is a no-op under
    Structured Streaming (SURVEY.md §4); the working equivalent is
    ``maxOffsetsPerTrigger``, applied here.
    """
    ensure_kafka_support(spark)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    return reader.load()


def parse_transactions(
    df: DataFrame,
    schema: T.StructType = TRANSACTION_SCHEMA,
    value_col: str = "value",
    reparse_timestamp: bool = True,
) -> DataFrame:
    """Decode the JSON payload and flatten (CSA:39-42).

    1. ``CAST(value AS STRING)`` — Kafka's value is binary.
    2. ``from_json`` against the fixed schema (PERMISSIVE: malformed
       rows -> all-null struct; JSON-number customer_id coerces to
       the declared String).
    3. ``select("data.*")`` flattens the transient struct.
    4. Quirk parity (CSA:42): the reference re-applies
       ``to_timestamp(ts, "yyyy-MM-dd HH:mm:ss")`` to the
       already-parsed timestamp — a cast->string->parse round trip
       that NULLs any timestamp carrying sub-second precision and
       truncates the rest to whole seconds.  Controlled by
       ``reparse_timestamp`` so correctness-mode callers can skip it.
       Implemented via ``reparse_timestamp_whole_seconds`` which uses
       ``try_to_timestamp``: the reference runs Spark 3.5 where parse
       failure yields NULL, but under Spark 4's ANSI default a plain
       ``to_timestamp`` would THROW on the first sub-second timestamp
       — and in streaming that exception is upstream of foreachBatch,
       killing the whole query regardless of ``swallow_errors``.
    """
    parsed = (
        df.selectExpr(f"CAST({value_col} AS STRING) AS value")
        .select(F.from_json(F.col("value"), schema).alias("data"))
        .select("data.*")
    )
    if reparse_timestamp and "timestamp" in parsed.columns:
        parsed = parsed.withColumn(
            "timestamp", reparse_timestamp_whole_seconds(F.col("timestamp"))
        )
    return parsed


def parse_transactions_with_dlq(
    df: DataFrame,
    schema: T.StructType = TRANSACTION_SCHEMA,
    value_col: str = "value",
    reparse_timestamp: bool = True,
    key_field: str = "transaction_id",
) -> DataFrame:
    """Decode like :func:`parse_transactions` but KEEP the raw payload
    of undecodable rows in a ``_corrupt`` column instead of silently
    carrying an all-null struct (the reference's PERMISSIVE behavior
    silently drops malformed messages into null-land — at ingest scale
    you want them routed to a dead-letter sink and counted).

    A row is corrupt when the payload fails to parse as a JSON object
    AT ALL or parses without the ``key_field`` the pipeline keys on
    (the all-null-struct disguise).  Valid rows carry ``_corrupt`` =
    NULL — route with two filters inside one foreachBatch (persist the
    batch first so the lineage executes once):

        good = batch.filter("_corrupt IS NULL").drop("_corrupt")
        dead = batch.filter("_corrupt IS NOT NULL")
    """
    raw = df.selectExpr(f"CAST({value_col} AS STRING) AS _raw")
    parsed = raw.select(
        "_raw", F.from_json(F.col("_raw"), schema).alias("data")
    )
    bad = F.col(f"data.{key_field}").isNull()
    out = parsed.select(
        "data.*", F.when(bad, F.col("_raw")).alias("_corrupt")
    )
    if reparse_timestamp and "timestamp" in out.columns:
        out = out.withColumn(
            "timestamp", reparse_timestamp_whole_seconds(F.col("timestamp"))
        )
    return out


def events_as_transactions(events: DataFrame) -> DataFrame:
    """Project the driver's ``events`` table onto the transaction shape
    (FIXTURES.md §1.4) so every reference-parity operator also runs on
    driver testdata."""
    return events.select(
        F.col("event_id").cast("string").alias("transaction_id"),
        F.col("user_id").cast("string").alias("customer_id"),
        F.col("ts").alias("timestamp"),
        F.col("value").alias("amount"),
        F.col("event_type").alias("payment_method"),
        F.col("event_type").alias("status"),
    )


#: Avro record schema of the reference's transaction payload — the
#: serializer its build DECLARES (avro + schema-registry deps,
#: SURVEY.md §2.11) while shipping JSON-only code.  All fields
#: nullable, matching TRANSACTION_SCHEMA's PERMISSIVE contract;
#: timestamp rides as a string exactly as in the JSON wire format.
TRANSACTION_AVRO_SCHEMA: dict = {
    "type": "record",
    "name": "transaction",
    "fields": [
        {"name": "transaction_id", "type": ["null", "string"]},
        {"name": "customer_id", "type": ["null", "string"]},
        {"name": "merchant_id", "type": ["null", "int"]},
        {"name": "timestamp", "type": ["null", "string"]},
        {"name": "amount", "type": ["null", "double"]},
        {"name": "payment_method", "type": ["null", "string"]},
        {"name": "status", "type": ["null", "string"]},
    ],
}


def parse_transactions_avro(
    df: DataFrame,
    avro_schema: dict | None = None,
    value_col: str = "value",
    reparse_timestamp: bool = True,
) -> DataFrame:
    """Confluent-Avro twin of :func:`parse_transactions`, jar-free:
    the decode chain the reference's declared dependencies imply but
    its code never wires.

    1. ``with_confluent_frame`` splits the Registry wire layout
       (magic byte + schema id + body) with codegen'd byte ops;
       non-Registry frames yield NULL payloads.
    2. ``decode_avro_payloads`` (pure-Python Avro binary reader,
       Arrow-batched ``mapInPandas``) turns bodies into typed
       columns — no spark-avro jar required; NULL payloads decode to
       all-null rows, mirroring PERMISSIVE JSON's contract.
    3. The string timestamp parses with ``try_to_timestamp`` (ANSI-
       safe) and optionally the reference's whole-seconds reparse
       quirk, exactly as the JSON path.

    Output: ``schema_id`` (Registry metadata, null for foreign
    frames) + the flattened transaction columns — a drop-in source
    for ``streaming.pipeline.aggregate_transactions``."""
    from kafka_sparkstreaming_sbt_spark.sources.avro import (
        with_confluent_frame,
    )
    from kafka_sparkstreaming_sbt_spark.sources.avro_ocf import (
        decode_avro_payloads,
    )

    if avro_schema is None:
        avro_schema = TRANSACTION_AVRO_SCHEMA
    framed = with_confluent_frame(
        df.select(F.col(value_col).alias("value")), "value"
    )
    decoded = decode_avro_payloads(
        framed, avro_schema, "avro_payload", keep_cols=("schema_id",)
    )
    if "timestamp" in decoded.columns:
        ts = F.try_to_timestamp(F.col("timestamp"))
        if reparse_timestamp:
            ts = reparse_timestamp_whole_seconds(ts)
        decoded = decoded.withColumn("timestamp", ts)
    return decoded

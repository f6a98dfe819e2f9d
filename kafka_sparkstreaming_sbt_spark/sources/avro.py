"""Avro payload decode/encode (extension surface — the reference
DECLARES Confluent Avro + Schema Registry dependencies but ships
JSON-only code, SURVEY.md §2.11; this carries that intent).

``from_avro``/``to_avro`` live in the external ``spark-avro`` module
(not bundled with the PySpark pip distribution), so everything here is
gated: :func:`avro_available` probes for the jar and the wrappers
raise a clear error instead of an opaque Py4J failure when it is
absent.  The JSON-schema string format is Avro's own, e.g.::

    {"type": "record", "name": "txn", "fields": [
        {"name": "transaction_id", "type": "string"}, ...]}
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro module is on the session's classpath."""
    try:
        jvm = spark._jvm  # type: ignore[attr-defined]
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.functions",
            False,
            jvm.Thread.currentThread().getContextClassLoader(),
        )
        return True
    except Exception:
        return False


def decode_avro(col: Column | str, json_schema: str) -> Column:
    """``from_avro(value, schema)`` — binary Kafka payloads -> struct
    (the Avro sibling of sources.kafka.parse_transactions)."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "spark-avro is not available; launch with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        ) from exc
    return from_avro(col, json_schema)


def encode_avro(col: Column | str) -> Column:
    """``to_avro(struct)`` — struct -> binary for an Avro sink."""
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "spark-avro is not available; launch with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        ) from exc
    return to_avro(col)

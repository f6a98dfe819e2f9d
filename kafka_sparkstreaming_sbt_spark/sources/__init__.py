"""Sources (SURVEY.md §2.1): Kafka stream, JSON decode, batch parquet /
in-memory, JDBC read-back, synthetic transaction generator."""

from kafka_sparkstreaming_sbt_spark.sources.batch import (  # noqa: F401
    load_tables,
    read_table,
)
from kafka_sparkstreaming_sbt_spark.sources.kafka import (  # noqa: F401
    parse_transactions,
    read_kafka_stream,
)
from kafka_sparkstreaming_sbt_spark.sources.synthetic import (  # noqa: F401
    synthetic_transactions_batch,
    synthetic_transactions_stream,
)

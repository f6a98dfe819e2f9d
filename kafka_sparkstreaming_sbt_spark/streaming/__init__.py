"""Streaming wiring (SURVEY.md §2.2 sinks, §2.6 event-time ops)."""

from kafka_sparkstreaming_sbt_spark.streaming.sinks import (  # noqa: F401
    start_console_sink,
    start_foreach_batch_sink,
    start_memory_sink,
)

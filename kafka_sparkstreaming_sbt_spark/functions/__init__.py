"""Scalar-function surface (SURVEY.md §2.7 F1-F10)."""

from kafka_sparkstreaming_sbt_spark.functions.scalar import (  # noqa: F401
    reparse_timestamp_whole_seconds,
    to_utc,
)

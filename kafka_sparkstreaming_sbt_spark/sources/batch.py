"""Batch sources (SURVEY.md §2.1 S3): parquet testdata tables and
in-memory fixtures.

Parquet reads are plain ``spark.read.parquet`` so Catalyst drives
column pruning and predicate pushdown into the scan — at 100 TB the
scan is the dominant cost and every query in this repo projects and
filters *before* any shuffle, which ``.explain`` confirms reaches the
scan node (``ReadSchema`` / ``PushedFilters``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver materializes at each scale factor (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table: ``{sf_dir}/{name}.parquet``.

    Timestamp physical types vary across testdata generations:
    naive TIMESTAMP(MICROS) (current) is read as TimestampType
    directly by disabling NTZ inference (session default, re-asserted
    here for foreign sessions) — wall clock == UTC instant under the
    UTC session TZ, and predicates stay pushable.  Legacy INT64
    TIMESTAMP(NANOS) files surface as long via ``nanosAsLong`` and
    are converted with exact integer division (``ts DIV 1000`` ->
    ``timestamp_micros``), keeping the whole path JVM-side.
    """
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(raw.dtypes).get("ts") == "bigint":  # nanos generation
            return raw.withColumn(
                "ts", F.expr("timestamp_micros(ts DIV 1000)")
            )
        return raw
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Read several tables into a dict keyed by table name."""
    return {name: read_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql``."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""JDBC batch source / sink options (SURVEY.md §2.1 S4, §2.2 K2).

The reference reads back its Postgres sink table in tests
(CustomerSpendingIntegrationTest.scala:340-347, :486-493) and appends
per micro-batch (CustomerSpendingAnalysis.scala:110-118).  No JDBC
driver jar ships in this environment, so these helpers only *build*
the reader/writer — tests exercise option plumbing, not a live DB.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


@dataclass(frozen=True)
class JdbcConfig:
    """Connection bundle (application.conf:1-10 analog)."""

    url: str
    table: str
    user: str = ""
    password: str = ""
    driver: str = "org.postgresql.Driver"
    #: per-executor write batching; the reference leaves Spark defaults.
    batchsize: int = 10_000
    #: cap concurrent connections hitting the DB from a big cluster.
    num_partitions: int | None = 8


def jdbc_reader(spark: SparkSession, cfg: JdbcConfig) -> DataFrameReader:
    """Configured JDBC reader (IT:340-347 analog)."""
    return (
        spark.read.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", cfg.table)
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("driver", cfg.driver)
    )


def write_jdbc_append(df: DataFrame, cfg: JdbcConfig) -> None:
    """Append ``df`` to the sink table (CSA:110-118).

    Scale notes vs the reference: executors open one connection per
    partition, so we coalesce to ``num_partitions`` before tiny-batch
    writes (SURVEY.md §4 'JDBC write parallelism') and set an explicit
    ``batchsize``.
    """
    out = df
    if cfg.num_partitions and df.rdd.getNumPartitions() > cfg.num_partitions:
        out = df.coalesce(cfg.num_partitions)
    (
        out.write.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", cfg.table)
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("driver", cfg.driver)
        .option("batchsize", str(cfg.batchsize))
        .mode("append")
        .save()
    )

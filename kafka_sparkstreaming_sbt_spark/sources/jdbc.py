"""JDBC batch source / sink (SURVEY.md §2.1 S4, §2.2 K2).

The reference reads back its Postgres sink table in tests
(CustomerSpendingIntegrationTest.scala:340-347, :486-493) and appends
per micro-batch (CustomerSpendingAnalysis.scala:110-118), swallowing
PK violations (CSA:172-175).  These helpers are LIVE-tested in
tests/test_jdbc.py against the embedded Derby engine that ships in
Spark's jar directory (``jdbc:derby:memory:``) — round trips, PK
rollback, both swallow modes, and the idempotent upsert.

``write_jdbc_upsert`` is the §7.4 "correctness mode": checkpoint +
idempotent sink = effectively-once delivery, replacing the
reference's swallow-and-drop contract.
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


def _exec_statements(spark: SparkSession, cfg: JdbcConfig, *stmts: str) -> None:
    """Run DDL/DML on the driver over a plain JDBC connection (the
    Spark JDBC writer only does INSERT; staging cleanup and MERGE are
    single statements the database runs server-side)."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(
        cfg.url, cfg.user or None, cfg.password or None
    )
    try:
        st = conn.createStatement()
        for sql in stmts:
            st.executeUpdate(sql)
        st.close()
    finally:
        conn.close()


def write_jdbc_upsert(
    df: DataFrame,
    cfg: JdbcConfig,
    key_cols: list[str],
    staging_table: str | None = None,
) -> None:
    """IDEMPOTENT per-batch upsert — the correctness-mode sink
    (SURVEY.md §7.4): with a checkpointed foreachBatch, a replayed
    micro-batch re-stages the same rows and the MERGE converges to the
    same table state, so delivery is effectively-once — no swallowed
    PK errors, no silent drops, no duplicates.

    Standard Spark JDBC upsert shape (the JDBC datasource has no merge
    mode): (1) truncate + parallel-append the batch into a staging
    table (executors stream partitions concurrently, exactly like the
    plain append path); (2) one server-side ``MERGE`` from staging
    into the target — a single atomic statement, and the only
    driver-side step is issuing it.  The staging table must exist with
    the target's schema.
    """
    staging = staging_table or f"{cfg.table}_staging"
    _exec_statements(df.sparkSession, cfg, f"DELETE FROM {staging}")
    write_jdbc_append(
        df, JdbcConfig(**{**cfg.__dict__, "table": staging})
    )
    non_keys = [c for c in df.columns if c not in key_cols]
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    set_clause = ", ".join(f"t.{c} = s.{c}" for c in non_keys)
    cols = ", ".join(df.columns)
    vals = ", ".join(f"s.{c}" for c in df.columns)
    _exec_statements(
        df.sparkSession,
        cfg,
        f"MERGE INTO {cfg.table} t USING {staging} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})",
        f"DELETE FROM {staging}",
    )

"""SparkSession construction.

The reference builds its session with ``master("local[*]")`` and forces
the session timezone to UTC (CustomerSpendingAnalysis.scala:11-14, :66,
:189-192).  We centralize that here and add the scale-oriented defaults
the reference leaves implicit: AQE for batch re-planning, Arrow for any
Pandas interchange, and a shuffle-partition count sized to the local
core count instead of Spark's default 200 (on a real cluster this is
overridden per deployment; the point is it is *configured*, not
defaulted).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "kafka_sparkstreaming_sbt_spark",
    master: str | None = None,
    shuffle_partitions: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with UTC + AQE + Arrow defaults.

    Mirrors the reference's session setup (CustomerSpendingAnalysis
    .scala:186-195) — UTC session timezone, local[*] default master,
    async state checkpointing for stateful streaming ops — with
    cluster-honest shuffle sizing.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # local-mode driver JVM IS the whole cluster; Spark's 1g
        # default starves broadcast builds and shuffle buffers (only
        # effective before the JVM launches — a no-op on getOrCreate
        # of an existing session, e.g. under the driver harness)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata parquet carries naive (isAdjustedToUTC=false)
        # microsecond timestamps; with NTZ inference on, Spark 4 maps
        # them to TIMESTAMP_NTZ, which breaks timestamp arithmetic
        # against the UTC-session TimestampType the pipeline uses.
        # Reading them as TimestampType directly (wall clock == UTC
        # instant under the UTC session TZ) also keeps timestamp
        # predicates pushable into the scan, which a cast-on-read
        # normalization would forfeit.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # reference sets async state checkpointing
        # (CustomerSpendingAnalysis.scala:16); carry the intent.
        .config(
            "spark.sql.streaming.stateStore.maintenanceInterval", "60s"
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

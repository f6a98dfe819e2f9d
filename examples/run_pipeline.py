"""End-to-end customer-spending pipeline runner — the drop-in
replacement for the reference's ``CustomerSpendingAnalysis.main``
(CustomerSpendingAnalysis.scala:186-220): config resolution -> Kafka
source -> decode -> dedup -> watermarked sliding-window agg ->
foreachBatch daily rollup -> JDBC append -> block.

Usage (live topology, mirrors application.conf:1-10):

    python examples/run_pipeline.py \
        --kafka-bootstrap localhost:9092 --topic transactions_topic \
        --jdbc-url jdbc:postgresql://localhost:5432/spending \
        --jdbc-user postgres --jdbc-password postgres \
        --checkpoint /tmp/spending_ckpt

Self-contained demo (no Kafka/Postgres — rate-source synthetic
producer, console sink):

    python examples/run_pipeline.py --demo --demo-seconds 30

Improvements over the reference, each behind a flag or default:
an explicit checkpoint location (the reference configures none —
SURVEY.md §2.9), ``maxOffsetsPerTrigger`` replacing the dead
DStream backpressure conf (§4), and ``--strict`` to surface JDBC
write errors instead of the reference's swallow-and-log
(CustomerSpendingAnalysis.scala:172-175).
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_sparkstreaming_sbt_spark.config import load_config, resolve
from kafka_sparkstreaming_sbt_spark.session import get_spark
from kafka_sparkstreaming_sbt_spark.sources.jdbc import (
    JdbcConfig,
    write_jdbc_append,
    write_jdbc_upsert,
)
from kafka_sparkstreaming_sbt_spark.sources.kafka import (
    parse_transactions,
    parse_transactions_with_dlq,
    read_kafka_stream,
)
from kafka_sparkstreaming_sbt_spark.sources.synthetic import (
    synthetic_transactions_stream,
)
from kafka_sparkstreaming_sbt_spark.streaming.pipeline import (
    run_spending_pipeline,
)


#: dotted keys mirror the reference's application.conf:1-10 (plus the
#: topology knobs its Scala hardcodes); CLI flags override the file,
#: the file overrides these defaults (config.resolve).
CONFIG_DEFAULTS = {
    "kafka.bootstrap.servers": "localhost:9092",
    "kafka.topic": "transactions_topic",
    "kafka.starting.offsets": "earliest",
    "db.url": "",
    "db.table": "public.customer_daily_spending",
    "db.user": "",
    "db.password": "",
    "db.driver": "org.postgresql.Driver",
    "pipeline.watermark": "5 seconds",
}

#: CLI flag dest -> config key
_ARG_TO_KEY = {
    "kafka_bootstrap": "kafka.bootstrap.servers",
    "topic": "kafka.topic",
    "starting_offsets": "kafka.starting.offsets",
    "jdbc_url": "db.url",
    "jdbc_table": "db.table",
    "jdbc_user": "db.user",
    "jdbc_password": "db.password",
    "watermark": "pipeline.watermark",
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--config",
        default=None,
        help="application.conf-style (HOCON subset) or JSON config "
        "file; CLI flags override it, it overrides built-in defaults",
    )
    p.add_argument("--kafka-bootstrap", default=None)
    p.add_argument("--topic", default=None)
    p.add_argument("--starting-offsets", default=None)
    p.add_argument("--jdbc-url", default=None)
    p.add_argument("--jdbc-table", default=None)
    p.add_argument("--jdbc-user", default=None)
    p.add_argument("--jdbc-password", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--watermark", default=None)
    p.add_argument(
        "--strict",
        action="store_true",
        help="fail the query on sink errors instead of swallowing them",
    )
    p.add_argument(
        "--upsert",
        action="store_true",
        help="correctness-mode sink (SURVEY §7.4): idempotent staged "
        "MERGE on (customer_id, transaction_date) instead of the "
        "reference's append-and-swallow; requires a <table>_staging "
        "sibling with the target schema",
    )
    p.add_argument(
        "--dlq",
        default=None,
        metavar="DIR",
        help="dead-letter directory: undecodable Kafka payloads are "
        "appended there as parquet (raw bytes + batch id) instead of "
        "flowing on as the reference's silent all-null rows",
    )
    p.add_argument(
        "--demo",
        action="store_true",
        help="rate-source producer + console sink; no Kafka/Postgres",
    )
    p.add_argument("--demo-seconds", type=int, default=30)
    args = p.parse_args()

    conf = resolve(
        CONFIG_DEFAULTS,
        load_config(args.config) if args.config else None,
        {
            key: getattr(args, dest)
            for dest, key in _ARG_TO_KEY.items()
            if getattr(args, dest) is not None
        },
    )

    spark = get_spark(app_name="customer-spending-pipeline")
    checkpoint = args.checkpoint or tempfile.mkdtemp(prefix="spending_ckpt_")

    if args.demo:
        txns = synthetic_transactions_stream(spark, rows_per_second=5)

        def write_daily(df):  # console stand-in for the JDBC sink
            df.show(20, truncate=False)

    else:
        envelope = read_kafka_stream(
            spark,
            conf["kafka.bootstrap.servers"],
            topic=conf["kafka.topic"],
            starting_offsets=conf["kafka.starting.offsets"],
        )
        if args.dlq:
            from pyspark.sql import functions as F

            parsed = parse_transactions_with_dlq(envelope)
            txns = parsed.filter("_corrupt IS NULL").drop("_corrupt")
            # second query over the same source (§3.2 pattern): dead
            # letters append to parquet with their own checkpoint
            (
                parsed.filter("_corrupt IS NOT NULL")
                .select(
                    F.col("_corrupt").alias("payload"),
                    F.current_timestamp().alias("seen_at"),
                )
                .writeStream.format("parquet")
                .option("path", args.dlq)
                .option("checkpointLocation", f"{checkpoint}_dlq")
                .start()
            )
        else:
            txns = parse_transactions(envelope)
        if not conf["db.url"]:
            p.error("--jdbc-url (or db.url in --config) is required "
                    "outside --demo mode")
        cfg = JdbcConfig(
            url=conf["db.url"],
            table=conf["db.table"],
            user=conf["db.user"],
            password=conf["db.password"],
            driver=conf["db.driver"],
        )

        if args.upsert:

            def write_daily(df):
                write_jdbc_upsert(
                    df, cfg, ["customer_id", "transaction_date"]
                )

        else:

            def write_daily(df):
                write_jdbc_append(df, cfg)

    query = run_spending_pipeline(
        txns,
        write_daily=write_daily,
        checkpoint_location=checkpoint,
        watermark=conf["pipeline.watermark"],
        swallow_errors=not args.strict,
    )
    if args.demo:
        # PySpark's awaitTermination takes SECONDS (the Scala API's
        # variant takes milliseconds — passing seconds*1000 here made
        # the demo run 1000x longer than asked)
        query.awaitTermination(args.demo_seconds)
        query.stop()
        spark.stop()
    else:
        query.awaitTermination()


if __name__ == "__main__":
    main()

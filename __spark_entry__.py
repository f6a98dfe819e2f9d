"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()[name](spark, sf_dir)`` vs ``oracle_sql()[name]`` (DuckDB)
is the per-operator correctness gate at sf0.01 (CORRECTNESS_r{N}.json).

Every aggregate double is rounded to 2 dp ON BOTH SIDES so the
order-insensitive value hash is stable across Spark's and DuckDB's
float summation orders (inputs are 2-dp money-like values, so true
sums are exact multiples of 0.01 and rounding is unambiguous).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_sparkstreaming_sbt_spark.operators.rollup import (  # noqa: E402
    daily_rollup_deterministic,
    daily_spending_direct,
)
from kafka_sparkstreaming_sbt_spark.operators.windows import (  # noqa: E402
    windowed_spending,
)
from kafka_sparkstreaming_sbt_spark.schemas import EVENT_PROPS_SCHEMA  # noqa: E402
from kafka_sparkstreaming_sbt_spark.sources.batch import read_table  # noqa: E402
from kafka_sparkstreaming_sbt_spark.sources.kafka import (  # noqa: E402
    events_as_transactions,
)

# --------------------------------------------------------------------------
# DuckDB oracle building block: Spark's TimeWindowing expansion for a
# 10-minute window sliding every 5 minutes (FIXTURES.md §3), written with
# naive-timestamp arithmetic so it is timezone-setting independent.
# --------------------------------------------------------------------------
_WINDOW_EXPANSION = """
WITH slides AS (SELECT 0 AS k UNION ALL SELECT 1),
expanded AS (
  SELECT e.*,
         TIMESTAMP '1970-01-01 00:00:00'
           + CAST(floor(epoch(ts)/300)*300 - k*300 AS BIGINT)
             * INTERVAL 1 SECOND AS window_start
  FROM events e CROSS JOIN slides
)
"""


def _r2(col: str) -> F.Column:
    return F.round(F.sum(col), 2)


def _utc(spark: SparkSession) -> SparkSession:
    """Force the UTC session timezone exactly as the reference does
    imperatively inside its transform builder (CustomerSpendingAnalysis
    .scala:66) — date casts are session-tz-sensitive and the DuckDB
    oracle runs on naive UTC timestamps."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


# --------------------------------------------------------------------------
# Queries (SURVEY.md §2 inventory, expressed over the driver testdata)
# --------------------------------------------------------------------------


def q_windowed_spending_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A2 (CustomerSpendingAnalysisNew1.scala:41-51): 10m/5m sliding
    window, sum(value) per (window, user)."""
    _utc(spark)
    events = read_table(spark, sf_dir, "events")
    out = windowed_spending(
        events,
        per_transaction=False,
        ts_col="ts",
        customer_col="user_id",
        amount_col="value",
    )
    return out.withColumn("total_spent", F.round("total_spent", 2))


def q_windowed_spending_per_event(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A1 (CustomerSpendingAnalysis.scala:76-88): grouping additionally
    keyed by event id — every event shows up in BOTH covering windows
    with its full amount (duplication semantics pinned by the golden
    fixtures)."""
    _utc(spark)
    events = read_table(spark, sf_dir, "events")
    out = windowed_spending(
        events,
        per_transaction=True,
        ts_col="ts",
        customer_col="user_id",
        amount_col="value",
        txn_col="event_id",
    )
    return out.withColumn(
        "window_total_spent", F.round("window_total_spent", 2)
    )


def q_daily_spending_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + A3 (CSA:104-109): windowed per-event agg -> one surviving
    window row per event (deterministic max-window variant of
    dropDuplicates) -> daily (customer, date) totals."""
    _utc(spark)
    events = read_table(spark, sf_dir, "events")
    txns = events_as_transactions(events)
    windowed = windowed_spending(txns, per_transaction=True)
    daily = daily_rollup_deterministic(windowed)
    return daily.withColumn("total_spent", F.round("total_spent", 2)).withColumn(
        # midnight timestamp instead of DATE so Spark's and DuckDB's
        # pandas representations agree under the driver's value hash
        "transaction_date",
        F.col("transaction_date").cast("timestamp"),
    )


def q_daily_spending_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (CSA:45-61 commented-out 'intended' semantics): dedup ->
    straight (customer, date) aggregation, no window detour."""
    _utc(spark)
    events = read_table(spark, sf_dir, "events")
    txns = events_as_transactions(events)
    daily = daily_spending_direct(txns)
    return daily.withColumn("total_spent", F.round("total_spent", 2)).withColumn(
        "transaction_date", F.col("transaction_date").cast("timestamp")
    )


def q_json_decode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/F1 (CSA:39-41): fixed-schema from_json over the events.props
    JSON payload, flattened and aggregated."""
    _utc(spark)
    events = read_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_type",
        F.from_json(F.col("props"), EVENT_PROPS_SCHEMA).alias("data"),
    ).select("event_type", "data.k")
    return parsed.groupBy("event_type").agg(
        F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n_events")
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary on lineitem — the batch headline
    query for bench: filter pushed to the parquet scan, partial->final
    hash agg, no joins."""
    _utc(spark)
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2("l_quantity").alias("sum_qty"),
            _r2("l_extendedprice").alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's signature daily spending rollup
    (windowed A1 -> dedup -> A3) on sf0.001."""
    return q_daily_spending_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "windowed_spending_per_customer": q_windowed_spending_per_customer,
        "windowed_spending_per_event": q_windowed_spending_per_event,
        "daily_spending_rollup": q_daily_spending_rollup,
        "daily_spending_direct": q_daily_spending_direct,
        "json_decode_props": q_json_decode_props,
        "pricing_summary": q_pricing_summary,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "windowed_spending_per_customer": _WINDOW_EXPANSION
        + """
        SELECT user_id, window_start,
               window_start + INTERVAL 10 MINUTE AS window_end,
               ROUND(SUM(value), 2) AS total_spent
        FROM expanded GROUP BY 1, 2, 3
        """,
        "windowed_spending_per_event": _WINDOW_EXPANSION
        + """
        SELECT user_id, event_id, window_start,
               window_start + INTERVAL 10 MINUTE AS window_end,
               ROUND(SUM(value), 2) AS window_total_spent
        FROM expanded GROUP BY 1, 2, 3, 4
        """,
        # the deterministic rollup keeps each event's LATER window, whose
        # start is the slide-aligned floor of ts — always the same date
        # as ts itself, so the oracle is the plain daily aggregate.
        "daily_spending_rollup": """
        SELECT CAST(user_id AS VARCHAR) AS customer_id,
               CAST(CAST(ts AS DATE) AS TIMESTAMP) AS transaction_date,
               ROUND(SUM(value), 2) AS total_spent
        FROM events GROUP BY 1, 2
        """,
        "daily_spending_direct": """
        SELECT CAST(user_id AS VARCHAR) AS customer_id,
               CAST(CAST(ts AS DATE) AS TIMESTAMP) AS transaction_date,
               ROUND(SUM(value), 2) AS total_spent
        FROM events GROUP BY 1, 2
        """,
        "json_decode_props": """
        SELECT event_type,
               CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
               COUNT(*) AS n_events
        FROM events GROUP BY 1
        """,
        "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(AVG(l_quantity), 2) AS avg_qty,
               ROUND(AVG(l_extendedprice), 2) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY 1, 2
        """,
    }

"""Session-window aggregation (extension surface — the reference uses
only fixed sliding windows, CustomerSpendingAnalysis.scala:77; session
windows are the event-time grouping Spark added for exactly this
clickstream shape, and they run identically in batch and Structured
Streaming).

``F.session_window(ts, gap)`` is the built-in: per key, events closer
than ``gap`` merge into one [first_ts, last_ts + gap) window.  The
physical plan is a single hash shuffle on the grouping key followed by
a sort-merge of overlapping sessions — no N^2, no state outside the
window operator, so it holds at 100 TB (sessions are per-user local).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Sessionize: one row per (user, session) with bounds and stats.

    ``session_end`` is Spark's definition — last event + gap (the
    moment the session would have expired).
    """
    return (
        events.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def session_stats(sessions: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-user session summary over :func:`user_sessions` output:
    session count, mean session duration (seconds), total events."""
    dur_us = F.unix_micros(F.col("session_end")) - F.unix_micros(
        F.col("session_start")
    )
    return sessions.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round((F.sum(dur_us) / F.count(F.lit(1))) / 1e6, 6).alias(
            "avg_session_secs"
        ),
        F.sum("n_events").alias("total_events"),
    )

"""Range (point-in-interval) join — the second time-series join class
Spark has no built-in for (SURVEY.md §2.12; the reference has no joins
at all — see ``asof.py`` for the most-recent-prior variant).

Spark plans a raw non-equi predicate (``p.ts BETWEEN i.start AND
i.end``) as BroadcastNestedLoopJoin — per-key quadratic work and a
broadcast of one whole side, which is exactly what dies first at
100 TB.  The scalable shape is the *binned* range join used by
interval-join implementations in stream processors (Flink's interval
join) and warehouse engines:

1. quantize time into fixed ``bin_seconds`` buckets;
2. a point belongs to exactly ONE bin; an interval is exploded to the
   (few) bins it overlaps — bounded-length intervals mean a bounded,
   small blow-up factor (``len/bin + 1``);
3. equi-join on (keys..., bin) — a plain shuffle hash/sort-merge join
   Catalyst and AQE know how to plan, skew-handle, and scale;
4. re-check the exact half-open containment ``start <= ts < end`` to
   discard same-bin near-misses.

Because each point has one bin, a qualifying (point, interval) pair
meets in exactly one bin: no duplicate elimination pass is needed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def bin_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    bin_seconds: int = 86_400,
) -> DataFrame:
    """Inner-join each ``points`` row to every ``intervals`` row whose
    half-open window ``[start_col, end_col)`` contains ``point_ts``
    (and whose ``keys`` match, when given).

    Column names other than ``keys`` must be disjoint between the two
    inputs — pre-alias when self-joining.  ``bin_seconds`` should be
    of the same order as the typical interval length: each interval
    is replicated ``ceil(len/bin) + 1`` times, so a too-small bin
    multiplies the shuffled interval rows while a too-large bin makes
    the post-join containment filter discard more near-misses.
    Intervals with ``end <= start`` are empty and dropped up front.
    """
    bin_us = int(bin_seconds) * _US
    p = points.withColumn(
        "_bin", (F.unix_micros(F.col(point_ts)) / bin_us).cast("long")
    )
    start_us = F.unix_micros(F.col(start_col))
    # half-open end: the last bin that can contain a point is the one
    # holding end - 1 microsecond
    end_us = F.unix_micros(F.col(end_col)) - F.lit(1)
    iv = intervals.filter(
        F.col(end_col) > F.col(start_col)
    ).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (start_us / bin_us).cast("long"),
                (end_us / bin_us).cast("long"),
            )
        ),
    )
    joined = p.join(iv, on=[*keys, "_bin"], how="inner")
    return joined.filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) < F.col(end_col))
    ).drop("_bin")


def purchase_prior_activity(
    events: DataFrame, window_hours: int = 24
) -> DataFrame:
    """Range-join query over the events table: for each purchase, the
    same user's activity in the ``window_hours`` before it — event
    count and summed value over the half-open window
    ``[purchase_ts - window, purchase_ts)``.

    Only purchases with at least one prior-window event appear (inner
    join semantics)."""
    window_us = window_hours * 3_600 * _US
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.timestamp_micros(
            F.unix_micros("ts") - F.lit(window_us)
        ).alias("_start"),
    )
    activity = events.select(
        "user_id", F.col("ts").alias("_ev_ts"), F.col("value").alias("_ev_value")
    )
    joined = bin_interval_join(
        activity,
        purchases,
        point_ts="_ev_ts",
        start_col="_start",
        end_col="purchase_ts",
        keys=("user_id",),
        bin_seconds=window_hours * 3_600,
    )
    return joined.groupBy("purchase_id", "user_id", "purchase_ts").agg(
        F.count("*").alias("n_prior"),
        F.round(F.sum("_ev_value"), 2).alias("prior_value"),
    )

"""Hypertable-style time-series repair (extension surface): dense
per-key daily spines with last-observation-carried-forward fill —
the gap-fill step every downstream rolling/seasonal computation
assumes has already happened.

Spark-first shape: the spine is DECLARED (``sequence`` + ``explode``
over each key's [min, max] day span), never driver-generated; the
actuals join back on (key, day) and a single per-key ordered window
carries the last non-null observation forward.  Cost at scale: one
aggregation to the day grain, one |keys|-row span aggregate, a spine
of |keys| x days rows (orders of magnitude smaller than the events
it summarizes), and ONE window shuffle on the key.  Nothing is
proportional to the raw event count after the first aggregate.

Cross-engine determinism: day values are rounded to cents before the
fill, so LOCF copies engine-identical values; the spine is exact
timestamp arithmetic (``sequence`` == ``generate_series``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key dense daily series: every day between the key's first
    and last observation, with missing days filled by the most recent
    prior day's total (LOCF) and flagged ``was_filled = 1``.

    Output: (key, day, day_value, value_filled, was_filled)."""
    daily = (
        df.groupBy(
            F.col(key_col).alias("k"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .agg(F.round(F.sum(value_col), 2).alias("day_value"))
    )
    spans = daily.groupBy("k").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = spans.select(
        "k",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 day"))
        ).alias("day"),
    )
    joined = spine.join(daily, ["k", "day"], "left")
    w = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("k").alias(key_col),
        "day",
        "day_value",
        F.last("day_value", ignorenulls=True).over(w).alias("value_filled"),
        F.when(F.col("day_value").isNull(), 1).otherwise(0).cast("int").alias(
            "was_filled"
        ),
    )

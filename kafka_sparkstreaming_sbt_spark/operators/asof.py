"""As-of (most-recent-prior-event) join — an operator class Spark has
no built-in for (SURVEY.md §2.12: the reference has no joins at all;
this is the time-series join every spending/attribution pipeline
eventually needs).

Implementation is the scalable union-sort trick, NOT a range join:

1. tag both sides and union them on (key, ts) with a side marker that
   sorts the right (reference) side first at equal timestamps — so a
   reference row at exactly t matches a left row at t ("at or
   before", the same inclusive semantics as DuckDB's ``ASOF JOIN ON
   l.ts >= r.ts``, which the oracle uses).
2. one window pass per key ordered by (ts, side):
   ``last(right_payload, ignorenulls=True)`` carries the most recent
   reference values forward.
3. keep the left rows.

Cost: ONE hash shuffle of (|L| + |R|) slim rows on the join key plus a
per-key sort — contrast a naive ``l.ts >= r.ts`` range join, which is
per-key quadratic.  No state grows beyond the window sort, so the
plan survives 100 TB (AQE handles hot keys; at extreme skew the key
can be salted with ts-bucket prefixes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each ``left`` row, attach the ``right`` row with the
    greatest ``right_ts`` <= ``left_ts`` (``direction="backward"``,
    the default) or the smallest ``right_ts`` >= ``left_ts``
    (``"forward"``) for the same ``on`` key — left-join semantics:
    unmatched left rows keep NULLs.  The pandas ``merge_asof``
    surface, re-expressed as ONE shuffle.

    ``right_cols`` are the right-side payload columns to carry
    (default: all except the key), emitted as ``<col><suffix>``.

    ``tolerance_seconds`` bounds the staleness (timestamp columns
    required): a match further than the tolerance from the left row
    is nulled out, NOT replaced by an older/newer one — the same
    contract as pandas, and it costs a post-filter, not a second
    window.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on]
    payload = [f"{c}{suffix}" for c in right_cols]

    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(p)
          for c, p in zip(right_cols, payload)],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None)
        .cast(l_tagged.schema["_left"].dataType)
        .alias("_left"),
        *[F.col(c).alias(p) for c, p in zip(right_cols, payload)],
        F.col(right_ts).alias("_r_ts"),
    )
    # forward = the same carry pass over the REVERSED time order;
    # _side still breaks ts ties with the reference row first, so
    # "at or after" stays inclusive
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_side",
        "_ts",
        "_left",
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_m_ts"),
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        gap = F.abs(F.unix_micros("_ts") - F.unix_micros("_m_ts"))
        in_tol = gap <= int(tolerance_seconds * 1_000_000)
        out = out.select(
            "_side",
            "_left",
            *[F.when(in_tol, F.col(p)).alias(p) for p in payload],
        )
    return out.select("_left.*", *payload)


def purchases_with_last_click(events: DataFrame) -> DataFrame:
    """Attribution query over the events table: each purchase joined
    as-of to the user's most recent click at or before it; ``wait_us``
    is the click-to-purchase latency in microseconds."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases, clicks, on="user_id", right_ts="click_ts",
        right_cols=["click_ts"], suffix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("click_ts").alias("last_click_ts"),
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("wait_us"),
        F.round("value", 2).alias("value"),
    )

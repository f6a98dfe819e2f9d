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
   ``last(match_struct, ignorenulls=True)`` carries the most recent
   reference row forward — ONE struct per right row, so the matched
   timestamp and every payload column always come from the SAME right
   row (a NULL payload field in the newest match stays NULL instead
   of silently falling back to an older row's value).
3. keep the left rows.

Cost: ONE hash shuffle of (|L| + |R|) slim rows on the join key plus a
per-key sort — contrast a naive ``l.ts >= r.ts`` range join, which is
per-key quadratic.  No state grows beyond the window sort, so the
plan survives 100 TB; at extreme skew (one hot key holding millions
of rows) pass ``salt_buckets=N`` to split each key's timeline into N
time-range buckets that sort independently (carry-in boundaries are
pre-aggregated per bucket, so results are identical to the unsalted
plan).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


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
    salt_buckets: int | None = None,
) -> DataFrame:
    """For each ``left`` row, attach the ``right`` row with the
    greatest ``right_ts`` <= ``left_ts`` (``direction="backward"``,
    the default) or the smallest ``right_ts`` >= ``left_ts``
    (``"forward"``) for the same ``on`` key — left-join semantics:
    unmatched left rows keep NULLs.  The pandas ``merge_asof``
    surface, re-expressed as ONE shuffle.

    ``right_cols`` are the right-side payload columns to carry
    (default: all except the key), emitted as ``<col><suffix>``.
    The match is atomic: all payload columns and the matched
    timestamp come from the single best-matching right row, exactly
    like ``merge_asof`` — a NULL field in that row is carried as
    NULL, never replaced by an older row's value.

    ``tolerance_seconds`` bounds the staleness (timestamp columns
    required): a match further than the tolerance from the left row
    is nulled out, NOT replaced by an older/newer one — the same
    contract as pandas, and it costs a post-filter, not a second
    window.

    ``salt_buckets=N`` (N > 1) splits every key's timeline into N
    equal time-range buckets sized from the right side's min/max
    timestamp (one cheap column agg).  Each (key, bucket) partition
    sorts independently; the latest (earliest, for ``forward``)
    right row of every earlier (later) bucket is pre-aggregated and
    injected as a carry-in boundary row, so the output is byte-equal
    to the unsalted plan while the per-partition sort shrinks ~N×.
    Use it when one hot key would otherwise make the per-key sort a
    straggler.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on]
    payload = [f"{c}{suffix}" for c in right_cols]

    left_t = StructType([StructField(c, left.schema[c].dataType) for c in left.columns])
    match_t = StructType(
        [StructField("_m_ts", right.schema[right_ts].dataType)]
        + [StructField(p, right.schema[c].dataType) for c, p in zip(right_cols, payload)]
    )

    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast(match_t).alias("_match"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left_t).alias("_left"),
        F.struct(
            F.col(right_ts).alias("_m_ts"),
            *[F.col(c).alias(p) for c, p in zip(right_cols, payload)],
        ).alias("_match"),
    )

    part_cols: list[str] = [on]
    unioned = l_tagged.unionByName(r_tagged)
    if salt_buckets is not None and salt_buckets > 1:
        salted = _salt_by_ts_bucket(
            l_tagged, r_tagged, on, left_t, int(salt_buckets), direction
        )
        if salted is not None:
            unioned, part_cols = salted

    # forward = the same carry pass over the REVERSED time order;
    # _side still breaks ts ties with the reference row first, so
    # "at or after" stays inclusive
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(ts_order, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_side",
        "_ts",
        "_left",
        F.last("_match", ignorenulls=True).over(w).alias("_match"),
    )
    out = carried.filter(F.col("_side") == 1)
    matched = [F.col("_match").getField(p) for p in payload]
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros("_ts") - F.unix_micros(F.col("_match").getField("_m_ts"))
        )
        in_tol = gap <= int(tolerance_seconds * 1_000_000)
        matched = [F.when(in_tol, m) for m in matched]
    return out.select("_left.*", *[m.alias(p) for m, p in zip(matched, payload)])


def _salt_by_ts_bucket(
    l_tagged: DataFrame,
    r_tagged: DataFrame,
    on: str,
    left_t: StructType,
    n_buckets: int,
    direction: str,
):
    """Split the union into (key, time-bucket) partitions with
    pre-aggregated carry-in boundary rows.  Returns (unioned_df,
    partition_cols), or None when the right side is empty / has a
    degenerate timestamp range (caller falls back to unsalted).

    Bucket bounds come from the right side's min/max timestamp — one
    column-pruned agg, the only extra pass.  Per key the boundary
    table holds at most ``n_buckets`` rows, so the carry-in window
    is trivially small no matter how hot the key is.
    """
    mn, mx = r_tagged.agg(
        F.min(F.unix_micros("_ts")), F.max(F.unix_micros("_ts"))
    ).first()
    if mn is None or mx <= mn:
        return None
    width = max(1, math.ceil((mx - mn + 1) / n_buckets))

    def bkt(ts_col):
        raw = F.floor((F.unix_micros(ts_col) - F.lit(mn)) / F.lit(width))
        return F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), raw)).alias("_bkt")

    l_b = l_tagged.withColumn("_bkt", bkt(F.col("_ts")))
    r_b = r_tagged.withColumn("_bkt", bkt(F.col("_ts")))

    # per-(key, bucket) boundary: the right row a NEIGHBOURING bucket
    # would match — latest for backward, earliest for forward
    pick = F.max_by if direction == "backward" else F.min_by
    bnd = r_b.groupBy(on, "_bkt").agg(
        pick(F.struct("_ts", "_match"), "_ts").alias("_b")
    )
    # dense grid over the buckets of keys the left side actually has,
    # so carry-ins hop across empty buckets too
    grid = (
        l_tagged.select(on)
        .distinct()
        .select(
            F.col(on),
            F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("_bkt"),
        )
    )
    g = grid.join(bnd, [on, "_bkt"], "left")
    if direction == "backward":
        w_c = (
            Window.partitionBy(on)
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_expr = F.last("_b", ignorenulls=True).over(w_c)
    else:
        w_c = (
            Window.partitionBy(on)
            .orderBy("_bkt")
            .rowsBetween(1, Window.unboundedFollowing)
        )
        carry_expr = F.first("_b", ignorenulls=True).over(w_c)
    carry_rows = (
        g.select(F.col(on), F.col("_bkt"), carry_expr.alias("_b"))
        .where(F.col("_b").isNotNull())
        .select(
            F.col(on),
            F.col("_b._ts").alias("_ts"),
            F.lit(0).alias("_side"),
            F.lit(None).cast(left_t).alias("_left"),
            F.col("_b._match").alias("_match"),
            F.col("_bkt"),
        )
    )
    unioned = l_b.unionByName(r_b).unionByName(carry_rows)
    return unioned, [on, "_bkt"]


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

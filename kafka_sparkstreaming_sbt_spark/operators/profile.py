"""Column profiling — the data-quality summary every ingest lands
with (extension surface beyond the reference; its analog is the ad-hoc
``count()`` actions sprinkled through CustomerSpendingAnalysis.scala:
168-172, generalized into one declarative table).

``profile_columns`` answers, per column, the four questions a
pipeline operator asks before trusting a new drop: how many rows,
how many nulls, how many distinct values, and the value range —
emitted as ONE tidy (column, ...) row each so the profile itself is
a joinable/diffable table (pair it with
:func:`~..operators.cdc.snapshot_diff` to alarm on profile drift
between corpus versions).

Scale shape: nulls and min/max come from a SINGLE aggregate over one
scan (no shuffle beyond the scalar agg).  Exact distinct counts are
the expensive leg — multiple ``count(distinct col)`` in one agg makes
Catalyst plan an Expand (the scan replays |cols| times through the
shuffle), so they are computed as ONE grouped pass per column over
the deduplicated (column, value) pairs when ``exact=True`` (the
oracle-checkable default), or as ``approx_count_distinct`` folded
into the single-scan aggregate when ``exact=False`` (the 100 TB
setting — HLL partials merge map-side, error ~2%).

min/max are reported as strings so heterogeneous columns share one
schema; each is computed in the column's NATIVE type first (numeric
min, not lexicographic) and cast only for display.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """One row per profiled column:
    ``(column, n_rows, n_null, n_distinct, min_value, max_value)``.

    ``exact=False`` swaps the distinct leg for HLL
    ``approx_count_distinct`` inside the single-scan aggregate —
    use it at corpus scale where a 2% distinct-count error is fine.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = set(cols) - set(df.columns)
    if missing:
        raise ValueError(f"unknown columns: {sorted(missing)}")

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"),
            F.min(c).cast("string").alias(f"min_{c}"),
            F.max(c).cast("string").alias(f"max_{c}"),
        ]
        if not exact:
            aggs.append(
                F.approx_count_distinct(c).alias(f"dist_{c}")
            )
    base = df.agg(*aggs)

    if exact:
        # one grouped pass per column over (value) — each is a
        # partial->final countDistinct-free aggregation (distinct
        # then count), no Expand replay of the scan per column
        dists = [
            df.select(F.col(c).alias("v"))
            .where(F.col("v").isNotNull())
            .distinct()
            .agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_distinct"),
            )
            for c in cols
        ]
        dist_tbl = reduce(lambda a, b: a.unionByName(b), dists)

    rows = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"null_{c}").alias("n_null"),
                        *(
                            []
                            if exact
                            else [F.col(f"dist_{c}").alias("n_distinct")]
                        ),
                        F.col(f"min_{c}").alias("min_value"),
                        F.col(f"max_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
    if exact:
        rows = rows.join(F.broadcast(dist_tbl), "column", "left").select(
            "column",
            "n_rows",
            "n_null",
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            "min_value",
            "max_value",
        )
    return rows


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    null_jump: float = 0.02,
    distinct_drop: float = 0.5,
) -> DataFrame:
    """The drift alarm between two :func:`profile_columns` outputs —
    the check a recurring ingest runs before promoting a new corpus
    version (the README's "pair the profile with snapshot_diff"
    promise as an operator): schema drift (columns added/removed),
    null-rate jumps, distinct-count collapse, and value-range shifts,
    one row per column.

    Output: ``(column, status, null_rate_old, null_rate_new,
    null_jump_flag, distinct_ratio, distinct_collapse_flag,
    range_changed)`` — ``status`` is added/removed/present; rates and
    the ratio are 6-dp rounds of exact integer counts (engine-stable);
    flags are 0/1 ints, NULL when a side is missing (natural SQL
    null propagation, identical on any engine).  ``distinct_ratio``
    compares distincts PER ROW, not absolute counts, so profiling a
    small batch against a big corpus doesn't false-alarm every
    high-cardinality column.

    Scale shape: the inputs are |columns|-row tables whatever the
    corpus size — the join is broadcast-trivial; all the heavy
    lifting already happened inside the two profile scans.
    """
    fields = ["n_rows", "n_null", "n_distinct", "min_value", "max_value"]
    o = old.select(
        "column", *[F.col(c).alias(f"{c}_old") for c in fields]
    )
    n = new.select(
        "column", *[F.col(c).alias(f"{c}_new") for c in fields]
    )
    j = o.join(n, "column", "full_outer")
    # try_divide: an empty side yields NULL rates (DuckDB's x/0
    # semantics), not an ANSI DivideByZero error
    null_rate_old = F.round(
        F.try_divide(F.col("n_null_old"), F.col("n_rows_old")), 6
    )
    null_rate_new = F.round(
        F.try_divide(F.col("n_null_new"), F.col("n_rows_new")), 6
    )
    # distinct RATE (distincts per row) ratio, not absolute counts:
    # a 150-row batch profiled against a 350-row corpus would
    # otherwise "collapse" every high-cardinality column purely by
    # being smaller — rounding happens ONCE at the end so the double
    # arithmetic is reproducible expression-for-expression in SQL
    distinct_ratio = F.round(
        F.try_divide(
            F.try_divide(
                F.col("n_distinct_new"), F.col("n_rows_new")
            ),
            F.try_divide(
                F.col("n_distinct_old"), F.col("n_rows_old")
            ),
        ),
        6,
    )
    present = F.col("n_rows_old").isNotNull() & F.col(
        "n_rows_new"
    ).isNotNull()
    return j.select(
        "column",
        F.when(F.col("n_rows_old").isNull(), F.lit("added"))
        .when(F.col("n_rows_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("present"))
        .alias("status"),
        null_rate_old.alias("null_rate_old"),
        null_rate_new.alias("null_rate_new"),
        ((null_rate_new - null_rate_old) > null_jump)
        .cast("int")
        .alias("null_jump_flag"),
        distinct_ratio.alias("distinct_ratio"),
        (distinct_ratio < distinct_drop)
        .cast("int")
        .alias("distinct_collapse_flag"),
        F.when(
            present,
            (
                ~F.col("min_value_old").eqNullSafe(F.col("min_value_new"))
                | ~F.col("max_value_old").eqNullSafe(
                    F.col("max_value_new")
                )
            ).cast("int"),
        ).alias("range_changed"),
    )

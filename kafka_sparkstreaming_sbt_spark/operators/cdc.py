"""Change-data compaction (extension surface, SURVEY.md §2.12): the
"keep the latest version of every key" upsert/merge step every
CDC-fed lake table needs before analytics can treat it as a snapshot.

Spark-first shape: ONE partial->final ``max_by`` aggregation — each
map partition reduces to at most one candidate row per key before the
shuffle, so the exchange carries |keys| rows, not |updates|.  The
window-function spelling (``row_number ... QUALIFY rn = 1``) that the
DuckDB oracle uses would shuffle every update row into the rank sort;
``max_by``'s partial aggregation is the scale-side win of expressing
"latest" as an aggregate instead of a rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tie_break: str | None = None,
) -> DataFrame:
    """One row per key: the row with the greatest ``ts_col``
    (ties broken by the greater ``tie_break`` — pass a unique column
    for a deterministic result; without one, ties pick an arbitrary
    contender).

    Output schema = input schema (key columns first).
    """
    payload = [c for c in df.columns if c not in key_cols]
    order = (
        F.struct(F.col(ts_col), F.col(tie_break))
        if tie_break is not None
        else F.struct(F.col(ts_col))
    )
    latest = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), order).alias("_r")
    )
    return latest.select(
        *key_cols, *[F.col(f"_r.{c}").alias(c) for c in payload]
    )

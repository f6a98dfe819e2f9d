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

from pyspark.sql import DataFrame, Window
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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Dataset-version diff: what changed between two corpus
    snapshots — ``(keys..., status, old_hash, new_hash)`` with status
    'added' (key only in new), 'removed' (key only in old), or
    'changed' (key in both, compared content differs).  Unchanged
    keys are absent, so the output is |delta|-sized, not
    |corpus|-sized — the property that makes a 100 TB version diff
    consumable.

    Scale shape: each side collapses to (key, content-hash) IN THE
    SCAN (md5 over the compared columns — no payload bytes cross the
    shuffle, just 32-hex hashes), then ONE full-outer join on the
    key.  Co-locate it for free by bucketing both snapshot lakes on
    the key (sources/files.py:write_bucketed).

    The hash is ``md5(concat_ws(US, compare_cols...))`` — concat_ws
    skips NULLs (identically in DuckDB, which keeps the oracle
    engine-stable), so a NULL column and an empty string collide;
    pass pre-normalized columns if that distinction matters.
    """
    sep = "\x1f"  # ASCII unit separator — vanishingly rare in data

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            *key_cols,
            F.md5(F.concat_ws(sep, *compare_cols)).alias(alias),
        )

    j = hashed(old, "old_hash").join(
        hashed(new, "new_hash"), key_cols, "full_outer"
    )
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(
            F.col("old_hash") != F.col("new_hash"), F.lit("changed")
        )
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*key_cols, "status", "old_hash", "new_hash")
    )


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_col: str,
    tie_break: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: collapse an event/CDC
    stream into validity intervals — one row per (key, attribute
    value) RUN, with ``valid_from`` / ``valid_to`` / ``is_current`` /
    ``version``.

    Two per-key windows, no joins: a ``lag`` marks rows where the
    attribute actually changed (run starts), then ``lead`` over the
    surviving change rows closes each interval.  Both windows
    partition on the same key, so Catalyst plans ONE shuffle and
    reuses the sort — the whole history build is a single exchange
    regardless of table size.  ``tie_break`` (a unique column) makes
    same-timestamp runs deterministic.
    """
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(tie_break))
    prev = F.lag(attr_col).over(w)
    # null-SAFE change detection: `prev != attr` evaluates to NULL when
    # either side is NULL, which would silently drop transitions TO a
    # NULL state and open a spurious version on the row AFTER one
    # (CDC streams carry NULL states routinely).  row_number()==1
    # identifies the true first row — prev.isNull() cannot, since a
    # NULL previous *value* looks identical to "no previous row".
    # Both window expressions share w, so this is still one shuffle.
    changes = df.select(
        *key_cols, ts_col, tie_break, attr_col
    ).withColumn(
        "_changed",
        (F.row_number().over(w) == 1)
        | ~prev.eqNullSafe(F.col(attr_col)),
    ).filter(
        "_changed"
    )
    w2 = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(tie_break))
    valid_to = F.lead(ts_col).over(w2)
    return changes.select(
        *key_cols,
        F.col(attr_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), 1).otherwise(0).cast("int").alias(
            "is_current"
        ),
        F.row_number().over(w2).cast("long").alias("version"),
    )

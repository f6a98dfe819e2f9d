"""Skew mitigation primitives (100 TB discipline — SURVEY.md §7.4).

AQE's runtime skew-join splitting (enabled in session defaults)
handles most batch skew automatically; these explicit operators cover
the cases it can't:

- streaming joins/aggs (no AQE re-planning mid-query),
- a single pathological key whose FINAL aggregation reducer is the
  straggler even after map-side partial aggregation,
- deterministic plans where runtime re-planning is undesirable.

Salting splits each hot key into ``buckets`` sub-keys so the shuffle
spreads one key's rows over ``buckets`` reducers; the other side of a
join is replicated ``buckets``-fold (so salt only the side/keys that
need it — replication is the price of the spread).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
    salt_on: str | None = None,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys overwhelm single
    reducers: each skewed row gets one of ``buckets`` salt values,
    ``other`` is replicated across all salts, and the join key becomes
    (key, salt) — hot keys now occupy ``buckets`` reducers.

    Result is identical to ``skewed.join(other, on, how)`` for inner /
    left joins (each skewed row still meets every matching other row
    exactly once).  Right/full/outer joins are REJECTED: the
    replicated side's unmatched rows would surface ``buckets`` times —
    silently wrong results.  Any Spark-accepted spelling of the safe
    types ('inner', 'left', 'left_outer', 'leftouter') is accepted.

    ``salt_on``: column to derive the salt from via ``xxhash64`` —
    fully deterministic, so a task RETRY routes every row to the same
    salt bucket (seeded ``rand`` is only per-partition-deterministic:
    correct either way, since salt only routes, but not
    bit-reproducible under repartitioning)."""
    normalized = how.lower().replace("_", "")
    if normalized not in ("inner", "left", "leftouter"):
        raise ValueError(
            "salted_join is only correct for inner/left joins; got "
            f"{how!r} — the replicated side's unmatched rows would "
            "appear once per salt bucket"
        )
    if salt_on is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(buckets))
    else:
        salt = (F.rand(seed=42) * buckets).cast("int")
    salted = skewed.withColumn("_salt", salt)
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = salted.join(replicated, [on, "_salt"], how)
    return out.drop("_salt")


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    buckets: int = 32,
    out_col: str | None = None,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation for extreme key skew: partial sums on
    (key, salt) spread a hot key over ``buckets`` reducers, the final
    (tiny — one row per key per salt) re-aggregation lands on one.

    Map-side partial aggregation already bounds shuffle VOLUME; what
    this fixes is the single final-stage reducer owning a hot key's
    every partial row when upstream partition count is large.

    ``salt_on``: name of a (unique-ish) column to derive the salt from
    via ``xxhash64`` — fully DETERMINISTIC, independent of
    partitioning and row order, so results are bit-reproducible across
    runs and engines (the driver-gate query uses this).  Without it
    the salt falls back to seeded ``rand`` (per-partition streams —
    deterministic only for a fixed partitioning)."""
    out_col = out_col or f"sum_{value_col}"
    if salt_on is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(buckets))
    else:
        salt = (F.rand(seed=42) * buckets).cast("int")
    salted = df.withColumn("_salt", salt)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(value_col).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(out_col))


def key_skew_report(
    df: DataFrame,
    key_cols: list[str] | str,
    top_n: int = 10,
) -> DataFrame:
    """The "should I salt this key?" diagnostic: the ``top_n``
    heaviest keys with their row counts and corpus share — the
    measurement that decides between a plain shuffle, AQE skew
    splitting, and an explicit :func:`salted_join` /
    :func:`salted_sum` before a 100 TB job is launched (a 30%-hot
    key is invisible at sf0.01 and a straggler at scale; this report
    is how it gets caught in the plan-review, not the postmortem).

    Output per heavy key: ``(key..., n_rows, share, rank)`` —
    ``share`` rounded to 6 dp, ranked by descending count with
    ascending-key ties (a total order, so the cut is deterministic).

    Scale shape: ONE partial->final count aggregation on the key (the
    exact shuffle the real job would do, so the report costs no more
    than one run of the job's cheapest possible form), a broadcast
    cross join for the total (scalar, kept lazy), and a
    ``TakeOrderedAndProject`` cut — no global sort, no collect.
    """
    from .topk import global_topk_with_rank

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys or top_n <= 0:
        raise ValueError("key_cols must be non-empty, top_n positive")
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    shared = counts.join(F.broadcast(total)).select(
        *keys,
        "n_rows",
        F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
    )
    return global_topk_with_rank(
        shared,
        [("n_rows", "desc")] + [(c, "asc") for c in keys],
        top_n,
    )

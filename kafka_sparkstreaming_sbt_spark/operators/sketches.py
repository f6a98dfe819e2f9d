"""Count-min sketch: mergeable sub-linear frequency estimation
(extension surface — the reference has no approximate operators; its
only aggregate is ``sum``, CustomerSpendingAnalysis.scala:81).

Cormode & Muthukrishnan 2005: a ``depth x width`` counter matrix; each
key increments one counter per row (chosen by that row's hash), and a
key's frequency estimate is the MIN of its ``depth`` counters — a
one-sided (over-)estimate with error <= 2N/width at probability
1 - 2^-depth.

Design for Spark / 100 TB:

- **building** is one partial->final aggregation over ``depth *
  width`` grouping keys — the map side combines down to at most
  ``depth * width`` rows per task BEFORE the shuffle, so the shuffle
  volume is bounded by the sketch size times the task count, never by
  the data.  This is exactly the "mergeable summary" contract: the
  per-partition partials ARE count-min sketches and addition merges
  them.
- **merging** two sketches (e.g. per-day sketches into a month) is a
  union + sum on (row, bucket) — counters are linear.
- **estimating** joins candidate keys against the sketch; the sketch
  side is AT MOST ``depth * width`` rows BY CONSTRUCTION (not
  data-dependent), so the broadcast is forced deliberately — this is
  the one join shape where a forced broadcast can never blow up.
- the hash family is ``md5(row || '|' || key)`` truncated to 32 bits
  — engine-portable (byte-identical in the DuckDB oracle, same
  discipline as the MinHash/SimHash operators), deterministic across
  retries, and independent-enough per row via the row-index salt.

Unlike the HLL++/KLL sketches (tolerance-gated, rows-only driver
check), count-min is fully DETERMINISTIC given the hash family — the
gate query hash-matches the DuckDB oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key: F.Column, row: int, width: int) -> F.Column:
    """Row ``row``'s counter index for ``key``: the first 8 hex chars
    of ``md5(row || '|' || key)`` as an unsigned 32-bit int, mod
    ``width``.  ``conv`` parses <= 8 hex chars into [0, 2^32) so the
    long cast is ANSI-safe.  A NULL key is coalesced to an explicit
    NUL-char sentinel BEFORE hashing — ``concat_ws`` would otherwise
    silently skip the NULL argument and hash the row salt alone,
    bucketing NULLs differently from any engine whose concat keeps a
    placeholder (the DuckDB oracle mirrors the same COALESCE)."""
    k = F.coalesce(key.cast("string"), F.lit("\x00"))
    h = F.md5(F.concat_ws("|", F.lit(str(row)), k))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt) with at most
    ``depth * width`` rows.  ``weight_col`` switches from occurrence
    counting to weighted sums (e.g. bytes per key)."""
    key = F.col(key_col)
    rb = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _bucket(key, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("rb"),
        *([F.col(weight_col).alias("_w")] if weight_col else []),
    )
    agg = (
        F.sum("_w") if weight_col else F.count(F.lit(1)).cast("long")
    ).alias("cnt")
    return rb.groupBy(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(agg)


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): counters are
    linear, so merge = union + sum per (row, bucket)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimated count per key in ``keys``: min over the ``depth``
    counters the key hashes to.  Keys the sketch never saw get the
    counter values of whatever shares their buckets (the documented
    count-min overestimate), or 0 for empty buckets."""
    kb = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _bucket(F.col(key_col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, "rb.row", "rb.bucket")
    # the sketch is <= depth*width rows BY CONSTRUCTION — the one
    # join where forcing the broadcast is always safe (cf. the
    # data-dependent candidate sets in dedup_fuzzy, where it is not)
    joined = kb.join(F.broadcast(sketch), ["row", "bucket"], "left")
    # groupBy alone yields exactly one row per distinct key — and,
    # unlike a join back on the key, it keeps a NULL key's group
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est_count")
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Keys whose ESTIMATED count >= ``min_count`` (the sketch decides
    — no second exact pass), with the estimate attached.  One-sided
    error: every true heavy hitter is returned; some below-threshold
    keys may ride along on collisions.

    The candidate key set here is ``df``'s distinct keys, i.e. this
    convenience wrapper still scans the input once to enumerate
    candidates; the 100 TB deployment shape is ``cms_sketch`` per
    ingest batch + ``cms_merge`` into the long-lived sketch +
    ``cms_estimate`` against an EXTERNAL candidate list (new batch
    keys, a watchlist) without touching history."""
    sketch = cms_sketch(df, key_col, depth, width)
    keys = df.select(key_col).distinct()
    est = cms_estimate(sketch, keys, key_col, depth, width)
    return est.filter(F.col("est_count") >= min_count)

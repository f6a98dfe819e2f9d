"""Broadcast Bloom-filter corpus screen — the exact-dedup shape that
actually survives a 100 TB corpus (extension surface beyond the
reference; its nearest analog is the pre-agg dropDuplicates screen,
CustomerSpendingAnalysis.scala:97, which keys WITHIN one stream —
this screens a new batch against an arbitrarily large EXISTING
corpus without shuffling the batch).

Why a bloom: an anti-join of batch-vs-corpus shuffles BOTH sides on
the key — at 100 TB the corpus shuffle dominates every ingest tick.
A Bloom filter compresses the corpus key set into a fixed bitmap
(~1.2 GB per billion keys at 1% fpp) built in ONE corpus pass, after
which membership is a map-only test on the batch.  Bloom negatives
are DEFINITELY new (no false negatives), so only the positive slice
— true duplicates plus an ``fpp`` fraction of the new docs — enters
the exact confirm join.  Final semantics are EXACT (identical to the
plain anti-join; the bloom is pure pruning), which is what lets the
gate query hash-match a plain ``NOT IN`` DuckDB oracle.

Engineering notes:

- **Hashing** is Kirsch-Mitzenmacher double hashing over two
  JVM-side ``xxhash64`` values (position_i = h1 + i*h2 mod n_bits,
  uint64 wraparound) — the per-row hash work stays codegen'd; Python
  only ever touches the two longs, vectorized through Arrow.
- **The build is a two-level DataFrame tree-reduce**: mapInArrow
  emits ONE bitmap row per partition (numpy bit-sets over the Arrow
  batch), a fan-in groupBy ORs ``fan`` partitions per task, and a
  final single-group OR yields the bitmap — no task ever holds more
  than ``fan`` bitmaps, no RDD API, and the driver receives exactly
  one bitmap.
- **The bitmap must fit in executor memory to broadcast** — that is
  the operator's contract, enforced by ``max_bitmap_bytes`` with a
  sizing hint in the error (same policy as the probe-table broadcast
  guard, similarity.py).
- **Determinism**: xxhash64 is seed-fixed, the OR is commutative, so
  the bitmap is identical for any partitioning — tested.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: refuse to build a bitmap bigger than this (broadcast contract)
DEFAULT_MAX_BITMAP_BYTES = 64 * 1024 * 1024

#: partitions OR'd per task in the tree-reduce fan-in stage
_FAN_IN = 64


def bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (n_bits, n_hashes) for ``expected_items`` keys at
    ``fpp`` false-positive rate: m = -n ln p / (ln 2)^2, k = m/n ln 2.
    n_bits is rounded up to a whole byte."""
    if expected_items <= 0:
        raise ValueError("expected_items must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    n_bits = math.ceil(
        -expected_items * math.log(fpp) / (math.log(2) ** 2)
    )
    n_bits = ((n_bits + 7) // 8) * 8
    n_hashes = max(1, round(n_bits / expected_items * math.log(2)))
    return n_bits, n_hashes


#: byte -> popcount lookup (256 entries) — fill-fraction probes touch
#: the bitmap once with one fancy-index + sum, no per-bit unpacking
_POPCOUNT = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(axis=1).astype(np.uint32)


def bloom_fill_fraction(bitmap: bytes) -> float:
    """Fraction of set bits — the saturation metric.  fpp of a Bloom
    filter at fill fraction X is X^k, so X=0.5 is the design point
    (fpp = 2^-k) and anything above it means the filter has outgrown
    its frozen sizing: the screen stays CORRECT (the confirm join
    catches false positives) but the map-only-for-negatives economics
    erode toward hash-join-everything.  One numpy pass."""
    bm = np.frombuffer(bitmap, dtype=np.uint8)
    if bm.size == 0:
        return 0.0
    return float(int(_POPCOUNT[bm].sum()) / (bm.size * 8))


def _with_hashes(df: DataFrame, key_col: str) -> DataFrame:
    """Two independent 64-bit hashes of the key, computed JVM-side
    (codegen'd xxhash64); Python never sees the key bytes."""
    return df.select(
        F.xxhash64(F.col(key_col)).alias("h1"),
        F.xxhash64(F.lit(1), F.col(key_col)).alias("h2"),
    )


def _positions(
    h1: np.ndarray, h2: np.ndarray, n_hashes: int, n_bits: int
) -> Iterator[np.ndarray]:
    """Kirsch-Mitzenmacher probe positions, uint64 wraparound."""
    a = h1.astype(np.uint64)
    b = h2.astype(np.uint64)
    for i in range(n_hashes):
        yield ((a + np.uint64(i) * b) % np.uint64(n_bits)).astype(
            np.int64
        )


def build_bloom(
    df: DataFrame,
    key_col: str,
    expected_items: int,
    fpp: float = 0.01,
    max_bitmap_bytes: int = DEFAULT_MAX_BITMAP_BYTES,
) -> tuple[bytes, int, int]:
    """Size for ``expected_items``/``fpp``, then one corpus pass ->
    ``(bitmap, n_bits, n_hashes)``; see :func:`build_bloom_bitmap`."""
    n_bits, n_hashes = bloom_params(expected_items, fpp)
    n_bytes = n_bits // 8
    if n_bytes > max_bitmap_bytes:
        raise ValueError(
            f"bloom bitmap would be {n_bytes} bytes for "
            f"{expected_items} items at fpp={fpp} — over the "
            f"{max_bitmap_bytes}-byte broadcast budget; raise fpp, "
            "shard the corpus, or raise max_bitmap_bytes"
        )
    return (
        build_bloom_bitmap(df, key_col, n_bits, n_hashes),
        n_bits,
        n_hashes,
    )


def _bitmap_partials(
    df: DataFrame, key_col: str, n_bits: int, n_hashes: int
) -> DataFrame:
    """Per-partition bitmap rows ``(bitmap, fan)`` — the first level
    of the tree-reduce.  The fan key MUST vary across partitions:
    mapInArrow emits one row per partition, so
    ``monotonically_increasing_id()`` here would always be
    ``partition_id << 33`` and pmod ``_FAN_IN`` of that is 0 for
    EVERY row, collapsing the fan-in to one group that np.stack-
    materializes all P bitmaps at once.  ``spark_partition_id()`` is
    the row's actual partition index, so pmod spreads partials over
    up to ``_FAN_IN`` groups and no OR task ever holds more than
    ``ceil(P / _FAN_IN)`` bitmaps."""
    n_bytes = n_bits // 8
    import pyarrow as pa

    hashes = _with_hashes(df, key_col)

    def _bitmap_per_partition(batches):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        saw = False
        for batch in batches:
            saw = True
            h1 = batch.column("h1").to_numpy(zero_copy_only=False)
            h2 = batch.column("h2").to_numpy(zero_copy_only=False)
            for pos in _positions(h1, h2, n_hashes, n_bits):
                np.bitwise_or.at(
                    bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
                )
        if saw:
            yield pa.RecordBatch.from_pydict(
                {"bitmap": [bm.tobytes()]},
                schema=pa.schema([("bitmap", pa.binary())]),
            )

    return hashes.mapInArrow(
        _bitmap_per_partition, "bitmap binary"
    ).withColumn(
        "fan", F.pmod(F.spark_partition_id(), F.lit(_FAN_IN))
    )


def build_bloom_bitmap(
    df: DataFrame, key_col: str, n_bits: int, n_hashes: int
) -> bytes:
    """One pass over ``df`` -> the raw bitmap for FIXED parameters —
    the form an incrementally-maintained filter needs: bitmaps built
    with the same (n_bits, n_hashes) OR-compose, so a lake can store
    one bitmap per accepted batch and a reader can fold them.

    Plan: codegen'd double-hash projection, mapInArrow per-partition
    bit-set (one bitmap row per partition), two-level OR fan-in
    (``_FAN_IN`` bitmaps per task), one-row collect.  The only
    driver-side data is the final bitmap — which is the deliverable.
    """
    partials = _bitmap_partials(df, key_col, n_bits, n_hashes)

    def _or_group(pdf):
        import pandas as pd

        acc = np.bitwise_or.reduce(
            np.stack(
                [
                    np.frombuffer(b, dtype=np.uint8)
                    for b in pdf["bitmap"]
                ]
            )
        )
        return pd.DataFrame({"bitmap": [acc.tobytes()]})

    fanned = partials.groupBy("fan").applyInPandas(
        _or_group, "bitmap binary"
    )
    rows = (
        fanned.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(_or_group, "bitmap binary")
        .collect()
    )
    if not rows:  # empty corpus -> empty filter (all-new batches)
        return bytes(n_bits // 8)
    return bytes(rows[0]["bitmap"])


def with_bloom_flag(
    df: DataFrame,
    key_col: str,
    bloom: tuple[bytes, int, int],
    flag_col: str = "bloom_maybe",
) -> DataFrame:
    """Map-only membership test: ``flag_col`` true when the key MIGHT
    be in the corpus (false => definitely new).  The bitmap rides an
    explicit SparkContext broadcast; the test is vectorized numpy
    over Arrow batches."""
    bitmap, n_bits, n_hashes = bloom
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)
    import pyarrow as pa

    with_h = df.withColumns(
        {
            "__h1": F.xxhash64(F.col(key_col)),
            "__h2": F.xxhash64(F.lit(1), F.col(key_col)),
        }
    )

    keep_names = [f.name for f in df.schema.fields]

    def _test(batches):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        for batch in batches:
            h1 = batch.column("__h1").to_numpy(zero_copy_only=False)
            h2 = batch.column("__h2").to_numpy(zero_copy_only=False)
            maybe = np.ones(len(h1), dtype=bool)
            for pos in _positions(h1, h2, n_hashes, n_bits):
                maybe &= (
                    bm[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))
                ) != 0
            arrays = [batch.column(n) for n in keep_names]
            arrays.append(pa.array(maybe, type=pa.bool_()))
            yield pa.RecordBatch.from_arrays(
                arrays, names=keep_names + [flag_col]
            )

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
    )
    return with_h.mapInArrow(_test, f"{out_schema}, {flag_col} boolean")


def bloom_screen(
    batch: DataFrame,
    corpus: DataFrame,
    key_col: str,
    expected_items: int,
    fpp: float = 0.01,
    max_bitmap_bytes: int = DEFAULT_MAX_BITMAP_BYTES,
) -> DataFrame:
    """Rows of ``batch`` whose ``key_col`` is NOT in ``corpus`` —
    EXACTLY (bloom negatives pass straight through; bloom positives
    are confirmed by a left-anti join that only the positive slice
    enters).  Equivalent to a plain anti-join, which is the oracle.

    Scale shape: one corpus pass builds the bitmap; the batch is
    map-only except for the positive slice (true-dup rate + fpp of
    the new docs).  At 100 TB the confirm join's corpus side is the
    remaining cost — co-locate it by bucketing the corpus lake on the
    key (sources/files.py:write_bucketed) so the confirm is a
    bucket-local join with no corpus shuffle.

    NULL-key convention: a batch row with a NULL ``key_col`` is kept
    as NEW — Spark's anti-join equality never matches NULL, and the
    bloom test of xxhash64(NULL) either reads false (pass-through) or
    true (row enters the confirm join, which passes it).  This is
    standard ``NOT EXISTS (… WHERE corpus.key = batch.key)``
    semantics; it deliberately differs from SQL ``NOT IN``, which
    drops NULL-key rows and returns nothing at all when the corpus
    contains a NULL key.  Callers wanting NULLs rejected should
    filter them upstream.

    The negative/positive split consumes the flagged batch twice, so
    the batch lineage up to the flag (scan + codegen'd hashes + one
    Arrow pass) executes per branch — cheap by construction; if the
    caller's batch rides an EXPENSIVE upstream, localCheckpoint it
    first (the engine's standard bounded-materialization move)."""
    bloom = build_bloom(
        corpus,
        key_col,
        expected_items,
        fpp=fpp,
        max_bitmap_bytes=max_bitmap_bytes,
    )
    flagged = with_bloom_flag(batch, key_col, bloom)
    negatives = flagged.filter(~F.col("bloom_maybe")).drop("bloom_maybe")
    positives = flagged.filter(F.col("bloom_maybe")).drop("bloom_maybe")
    confirmed_new = positives.join(
        corpus.select(F.col(key_col).alias("__ck")).distinct(),
        positives[key_col] == F.col("__ck"),
        "left_anti",
    )
    return negatives.unionByName(confirmed_new)

"""File sources & sinks (extension surface — SURVEY.md §2.12 notes
the reference has NO file sources/sinks; every lake deployment needs
them, and the streaming file source doubles as the deterministic
replay harness for Kafka-shaped payloads in tests).

Schema discipline mirrors the reference's schema-on-read stance
(explicit StructType to ``from_json``, CustomerSpendingAnalysis
.scala:30-43): every reader takes an explicit schema — inference is
banned in the data path (a schema-inference pass over 100 TB is a
full extra scan, and drifting inferred types break downstream plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType,
    streaming: bool = False,
    **options: str,
) -> DataFrame:
    """JSON lines with an explicit schema; PERMISSIVE parse mode like
    the reference's ``from_json`` (malformed rows -> nulls, SURVEY.md
    §1.2) unless overridden via ``mode=``."""
    reader = spark.readStream if streaming else spark.read
    return reader.schema(schema).options(**options).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    streaming: bool = False,
    header: bool = True,
    **options: str,
) -> DataFrame:
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(schema)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Lake-layout writer: hive-style partition directories so
    downstream date/key predicates become partition PRUNING (the scan
    never opens non-matching directories — the single biggest lever on
    a 100 TB table)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sort-within-bucket) managed parquet
    table — the CO-LOCATED JOIN layout for 100 TB fact tables.

    Rows are hash-distributed into ``n_buckets`` files per partition
    by ``bucket_by``; the bucketing spec lives in the catalog
    (``saveAsTable`` — plain ``.parquet(path)`` cannot carry it), so
    Catalyst treats each scan as already hash-partitioned on the key:
    equi-joins and aggregations between tables bucketed the same way
    run with ZERO Exchange (asserted in tests/test_file_sources.py).
    Pre-paying the shuffle once at write time beats re-shuffling both
    fact tables on every join — the standard layout decision for
    orders x lineitem at lake scale.  ``sort_by`` additionally orders
    within buckets so sort-merge joins skip their sort step.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(
        n_buckets, *bucket_by
    )
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction — the maintenance pass every streaming-
    fed lake table needs: micro-batch sinks leave thousands of KB-size
    files whose per-file open/footer cost eventually dominates scans.

    Sizes the output from the Hadoop FileSystem listing (no data
    scan): ``ceil(input_bytes / target_file_bytes)`` files, rewritten
    via ``repartition`` (round-robin — even output sizes; ``coalesce``
    would merge neighbors and inherit their skew).  Returns the output
    file count."""
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    spark.read.parquet(src_path).repartition(n_files).write.mode(
        mode
    ).parquet(dest_path)
    return n_files


def write_range_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, sorted lake layout — the third layout lever
    after hive partitioning (directory pruning) and bucketing
    (co-located joins): ``repartitionByRange`` gives globally
    range-disjoint files and the within-file sort gives tight
    parquet row-group min/max statistics, so selective predicates on
    ``sort_cols`` (typically event time) skip whole files and row
    groups at scan time.  The standard layout for time-series fact
    tables queried by time range."""
    out = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    out.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def zorder_value(
    x, y, lo_x: float, hi_x: float, lo_y: float, hi_y: float, bits: int = 8
):
    """Morton (Z-order) interleave of two numeric columns, each
    quantized to ``bits`` equi-width buckets over [lo, hi] — pure
    integer arithmetic (floor/shift/or via multiply-add), fully
    codegen'd, no UDF.

    Equi-width quantization keeps this driver-free (no sampling job);
    heavily skewed columns would want equi-DEPTH boundaries from
    ``approxQuantile`` instead — same interleave, different bucket
    edges."""
    from pyspark.sql import functions as F

    n = (1 << bits) - 1

    def bucket(c, lo, hi):
        span = (hi - lo) or 1.0
        return F.least(
            F.lit(n),
            F.greatest(
                F.lit(0),
                F.floor((c.cast("double") - lo) / span * (n + 1)).cast(
                    "long"
                ),
            ),
        )

    bx, by = bucket(x, lo_x, hi_x), bucket(y, lo_y, hi_y)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (bx.bitwiseAND(1 << i) * (1 << (i + 1)))  # bit i -> 2i+1
            + (by.bitwiseAND(1 << i) * (1 << i))  # bit i -> 2i
        )
    return z


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton curve) lake layout — the multi-dimensional
    sibling of :func:`write_range_sorted_parquet`: a linear sort gives
    perfect pruning on its leading column and none on the second,
    while interleaving the two columns' bucket bits makes file and
    row-group min/max ranges tight in BOTH dimensions, so selective
    predicates on either column (or both) skip most of the layout.
    The standard technique for fact tables queried along two
    independent axes (e.g. user x time).

    One pass: compute the z-value (codegen'd integer ops), range
    partition + sort on it, drop it at write.  Bucket edges come from
    one tiny min/max aggregate (a metadata-cheap scan — at lake scale
    supply known domain bounds instead and skip it)."""
    import pyspark.sql.functions as F

    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).first()
    z = zorder_value(
        F.col(col_x),
        F.col(col_y),
        float(lo_x),
        float(hi_x),
        float(lo_y),
        float(hi_y),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
